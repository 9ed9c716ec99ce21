"""Pointer-doubling redirect/canonical chain resolution."""


def test_resolve_redirects_chains_cycles_cap_identity(spark):
    from narowi_ocr_spark.operators.redirects import resolve_redirects

    edges = [("a", "b"), ("b", "c"), ("c", "T"),
             ("x", "y"), ("y", "x"), ("e", "x")]
    # a 40-hop chain exceeds the 32-hop cap
    edges += [(f"l{i}", f"l{i+1}") for i in range(40)]
    e = spark.createDataFrame(edges, "src string, dst string")
    nodes = spark.createDataFrame(
        [("a",), ("T",), ("zzz",), ("x",)], "src string"
    )
    got = {r["src"]: (r["final"], r["hops"], r["resolved"])
           for r in resolve_redirects(e, nodes=nodes).collect()}

    # exact hop counts along resolved chains
    assert got["a"] == ("T", 3, True)
    assert got["c"] == ("T", 1, True)
    # cycle members and entries come back unresolved, hops at the cap
    assert got["x"] == ("x", 32, False)
    assert got["y"] == ("y", 32, False)
    assert got["e"][1:] == (32, False) and got["e"][0] in ("x", "y")
    # chain longer than the cap is honestly unresolved, not truncated
    assert got["l0"][2] is False
    # but its tail within reach resolves exactly
    assert got["l38"] == ("l40", 2, True)
    # nodes with no pointer are identity rows (total mapping)
    assert got["T"] == ("T", 0, True)
    assert got["zzz"] == ("zzz", 0, True)


def test_resolve_redirects_without_nodes_only_pointer_rows(spark):
    from narowi_ocr_spark.operators.redirects import resolve_redirects

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = resolve_redirects(e).collect()
    assert len(got) == 1
    assert (got[0]["src"], got[0]["final"], got[0]["hops"],
            got[0]["resolved"]) == ("a", "b", 1, True)

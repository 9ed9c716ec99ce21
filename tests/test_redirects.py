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


def test_resolve_redirects_early_exit_identity_and_rounds(spark):
    """The convergence early-exit is bit-identical to the fixed-round
    run, and actually exits: short chains stop as soon as a round moved
    nothing (rounds ~ log2(longest chain), not log2(max_hops)), while
    cycles — which keep moving forever — still run every round and come
    back capped exactly as before."""
    from narowi_ocr_spark.operators.redirects import resolve_redirects

    # longest chain = 3 hops; plus a 2-cycle entered from outside
    edges = [("a", "b"), ("b", "c"), ("c", "T"),
             ("p", "q"), ("q", "p"), ("e", "p")]
    e = spark.createDataFrame(edges, "src string, dst string")
    nodes = spark.createDataFrame([("a",), ("T",), ("solo",)], "src string")

    def snap(df):
        return sorted(
            (r["src"], r["final"], r["hops"], r["resolved"])
            for r in df.collect()
        )

    st_fast: dict = {}
    fast = snap(resolve_redirects(e, nodes=nodes, stats=st_fast))
    st_slow: dict = {}
    slow = snap(resolve_redirects(
        e, nodes=nodes, early_exit=False, stats=st_slow))
    assert fast == slow
    # cycle rows keep moving, so the cycle corpus pins the full count...
    assert st_slow["rounds_run"] == 5  # ceil(log2(32))
    assert st_fast["rounds_run"] == 5
    # ...and a cycle-free corpus exits early: chain of 3 converges once
    # a round moves nothing (round 2 covers distance 4 > 3; round 3 is
    # the no-op that proves it)
    e2 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "T")], "src string, dst string"
    )
    st2: dict = {}
    got2 = snap(resolve_redirects(e2, stats=st2))
    assert st2["rounds_run"] <= 3
    st2_slow: dict = {}
    assert got2 == snap(resolve_redirects(
        e2, early_exit=False, stats=st2_slow))
    assert st2_slow["rounds_run"] == 5
    # no _moved leakage into the public schema
    cols = resolve_redirects(e2).columns
    assert cols == ["src", "final", "hops", "resolved"]

"""URL canonicalization, training-shard assignment, and the
stream-stream attribution join (streaming result == batch twin)."""

from __future__ import annotations

import datetime
import tempfile
import uuid

from pyspark.sql import functions as F

from narowi_ocr_spark.operators.shards import shard_assign, shard_sizes
from narowi_ocr_spark.operators.urls import (
    canonical_url,
    registered_domain,
    url_host,
)
from narowi_ocr_spark.streaming.joins import attribute_batch, attribute_stream

URL_CASES = [
    # (raw, canonical, host, registered_domain)
    (
        "HTTP://Example.COM:80/Path/Index.html?b=2&utm_source=x&a=1#frag",
        "http://example.com/Path/Index.html?a=1&b=2",
        "example.com",
        "example.com",
    ),
    (
        "https://News.BBC.CO.UK:443/world?id=7",
        "https://news.bbc.co.uk/world?id=7",
        "news.bbc.co.uk",
        "bbc.co.uk",
    ),
    (
        "https://sub.shop.example.co.jp/items?utm_campaign=a&z=9&y=8",
        "https://sub.shop.example.co.jp/items?y=8&z=9",
        "sub.shop.example.co.jp",
        "example.co.jp",
    ),
    ("http://example.org", "http://example.org/", "example.org", "example.org"),
    (
        "https://example.com:8443/secure?gclid=abc",
        "https://example.com:8443/secure",
        "example.com",
        "example.com",
    ),
    (
        "http://www.data.gov/?fbclid=zz&q=spark",
        "http://www.data.gov/?q=spark",
        "www.data.gov",
        "data.gov",
    ),
    (
        "HTTPS://A.B.C.Example.COM/deep/path/#x",
        "https://a.b.c.example.com/deep/path/",
        "a.b.c.example.com",
        "example.com",
    ),
    (
        "http://localhost:8080/test?x=1&x=0",
        "http://localhost:8080/test?x=0&x=1",
        "localhost",
        "localhost",
    ),
    (
        "https://media.example.com.au/video?ref=home&id=3",
        "https://media.example.com.au/video?id=3",
        "media.example.com.au",
        "example.com.au",
    ),
    (
        # tracking match is case-sensitive: UTM_x is kept, and 'U' < 'c'
        # in byte order
        "http://Example.Com/a%20b?UTM_x=1&c=3",
        "http://example.com/a%20b?UTM_x=1&c=3",
        "example.com",
        "example.com",
    ),
    (
        "https://shop.example.co.uk/cart?item=5&utm_medium=email&item=2",
        "https://shop.example.co.uk/cart?item=2&item=5",
        "shop.example.co.uk",
        "example.co.uk",
    ),
    (
        "http://api.internal.example.com:80/v1/get?",
        "http://api.internal.example.com/v1/get",
        "api.internal.example.com",
        "example.com",
    ),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, r) for i, (r, _, _, _) in enumerate(URL_CASES)], "i int, url string"
    )
    got = {
        r["i"]: (r["norm"], r["host"], r["rd"])
        for r in df.select(
            "i",
            canonical_url(F.col("url")).alias("norm"),
            url_host(F.col("url")).alias("host"),
            registered_domain(url_host(F.col("url"))).alias("rd"),
        ).collect()
    }
    for i, (_, want_norm, want_host, want_rd) in enumerate(URL_CASES):
        assert got[i] == (want_norm, want_host, want_rd), f"case {i}"


def test_canonical_url_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op."""
    df = spark.createDataFrame(
        [(r,) for r, _, _, _ in URL_CASES], "url string"
    ).select(canonical_url(F.col("url")).alias("c1"))
    bad = df.where(canonical_url(F.col("c1")) != F.col("c1")).count()
    assert bad == 0


def test_shard_assign_partition_and_order(spark):
    n = 400
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    a = shard_assign(df, hex_digits=1, salt="epoch0").collect()
    assert len(a) == n
    by_shard: dict[int, list] = {}
    for r in a:
        assert 0 <= r["shard"] < 16
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are exactly 1..len(shard) — a dense per-shard rank
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # deterministic under re-run; different salt = different permutation
    b = shard_assign(df, hex_digits=1, salt="epoch0").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assign(df, hex_digits=1, salt="epoch1").collect()
    }
    moved = sum(
        1 for r in a if (r["shard"], r["pos"]) != c[r["doc_id"]]
    )
    assert moved > n // 2


def test_shard_assign_256_balance(spark):
    df = spark.range(6400).select(F.col("id").alias("doc_id"))
    sizes = shard_sizes(shard_assign(df, hex_digits=2)).collect()
    assert len(sizes) > 200  # nearly all 256 shards hit at 25 docs/shard
    assert max(r["n_docs"] for r in sizes) < 6400 // 256 * 4


def _synth_events(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(40):
        for k in range(6):
            kind = "view" if (u + k) % 3 != 0 else "purchase"
            rows.append(
                (u, t0 + datetime.timedelta(minutes=7 * u + 13 * k), kind, float(k))
            )
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def test_attribution_stream_matches_batch(spark):
    ev = _synth_events(spark)
    want = sorted(
        map(tuple, attribute_batch(ev).collect())
    )
    assert len(want) > 50  # non-trivial join
    src = tempfile.mkdtemp(prefix="attr_src_")
    ev.coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp_ntz, event_type string, value double"
        )
        .parquet(src)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
    )
    name = "attr_" + uuid.uuid4().hex[:8]
    sq = (
        attribute_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="attr_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    got = sorted(map(tuple, spark.table(name).collect()))
    assert got == want


def test_url_struct_matches_scalar_functions(spark):
    """The bind-once struct form is value-identical to the scalar
    helpers for every fixture case."""
    from narowi_ocr_spark.operators.urls import url_struct

    df = spark.createDataFrame(
        [(r,) for r, _, _, _ in URL_CASES], "url string"
    )
    bad = (
        df.withColumn("_p", url_struct(F.col("url")))
        .where(
            (F.col("_p.norm_url") != canonical_url(F.col("url")))
            | (F.col("_p.host") != url_host(F.col("url")))
            | (
                F.col("_p.reg_domain")
                != registered_domain(url_host(F.col("url")))
            )
        )
        .count()
    )
    assert bad == 0


def test_attribution_outer_stream_matches_batch(spark):
    """leftOuter stream-stream join: unmatched views emit exactly one
    NULL-purchase row once the watermark passes view_ts + horizon (the
    far-future sentinel view pushes the final watermark past every real
    view; availableNow's terminal no-data batch performs the flush)."""
    ev = _synth_events(spark)
    want = sorted(map(repr, attribute_batch(ev, how="left").collect()))
    n_null = sum("purchase_ts=None" in r for r in want)
    assert n_null > 10  # unmatched views exist in the fixture
    flush_ts = ev.agg(F.max("ts")).first()[0] + datetime.timedelta(days=2)
    # one sentinel PER SIDE: the global watermark is the MIN across the
    # two withWatermark columns, so a view-only sentinel would leave the
    # purchase-side watermark (and thus the global one) behind
    sentinel = spark.createDataFrame(
        [(-1, flush_ts, "view", 0.0), (-1, flush_ts, "purchase", 0.0)],
        "user_id long, ts timestamp, event_type string, value double",
    )
    src = tempfile.mkdtemp(prefix="attr_outer_src_")
    ev.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp_ntz, event_type string, value double"
        )
        .parquet(src)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
    )
    name = "attr_outer_" + uuid.uuid4().hex[:8]
    sq = (
        attribute_stream(stream, how="leftOuter")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="attr_outer_ckpt_")
        )
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination(300)
    got = sorted(
        map(repr, spark.table(name).where(F.col("user_id") >= 0).collect())
    )
    assert got == want


def test_shard_manifest_checksum_bounded_and_stable(spark):
    """The order-free content checksum must stay exact int64 at
    production shard sizes: every per-doc term is an 8-hex md5 prefix
    (< 2^32), so the sum is overflow-free to ~2^31 docs/shard
    (ADVICE r2: 12-hex terms wrapped silently past ~32k docs/shard).
    Also: the checksum is partition-count independent."""
    from narowi_ocr_spark.operators.shards import shard_manifest

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc body "), F.col("id").cast("string")).alias("text"),
    )
    assigned = shard_assign(df, hex_digits=1)
    m1 = {r["shard"]: r for r in shard_manifest(assigned, df).collect()}
    # per-doc terms < 2^32 ⇒ any shard's sum < n_docs * 2^32
    for r in m1.values():
        assert 0 <= r["content_checksum"] < r["n_docs"] * (1 << 32)
    # repartitioning the input must not change any checksum (order-free)
    df8 = df.repartition(8)
    m2 = {
        r["shard"]: r
        for r in shard_manifest(shard_assign(df8, hex_digits=1), df8).collect()
    }
    assert {k: v["content_checksum"] for k, v in m1.items()} == {
        k: v["content_checksum"] for k, v in m2.items()
    }


def test_anchor_texts_resolution_and_fold(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import anchor_texts

    rows = [
        Row(
            url="https://a.example/p1",
            html='<a href="https://t.example/x">Great <b>Site</b> </a>'
            '<a href="/rel">RelLink</a>'
            '<a href="mailto:x@y">mail</a>',
        ),
        Row(
            url="https://b.example/p2",
            html='<a href="https://t.example/x">great site</a>'
            '<a href="https://t.example/x">other words</a>',
        ),
        Row(url="https://c.example/p3", html="<p>no links at all</p>"),
    ]
    got = {
        r["target"]: r
        for r in anchor_texts(spark.createDataFrame(rows)).collect()
    }
    # cross-page target: 3 refs from 2 pages; tag-strip + trim + lower
    # folds 'Great <b>Site</b> ' and 'great site' into one anchor that
    # outvotes 'other words'
    t = got["https://t.example/x"]
    assert t["n_refs"] == 3 and t["n_src_pages"] == 2
    assert t["top_anchor"] == "great site"
    assert t["top_anchor_refs"] == 2
    # root-relative resolves against the SOURCE page's origin
    r = got["https://a.example/rel"]
    assert r["n_refs"] == 1 and r["top_anchor"] == "rellink"
    # mailto dropped; no-link page emits nothing
    assert all(not k.startswith("mailto") for k in got)
    assert len(got) == 2


def test_anchor_texts_tie_breaks_lexicographically(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import anchor_texts

    rows = [
        Row(url="https://a.example/1",
            html='<a href="https://t.example/">alpha</a>'),
        Row(url="https://a.example/2",
            html='<a href="https://t.example/">beta</a>'),
    ]
    (r,) = anchor_texts(spark.createDataFrame(rows)).collect()
    # 1-1 tie: lexicographically-largest anchor wins, deterministically
    assert r["top_anchor"] == "beta" and r["top_anchor_refs"] == 1


def test_page_meta_fields_and_plan(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import page_meta

    rows = [
        Row(
            url="https://x.example/1",
            html='<html lang="EN-us"><head><title> Hi <i>there</i> '
            '</title><meta charset=UTF-8>'
            '<meta name="robots" content="NOINDEX">'
            '<link rel="canonical" href="https://x.example/canon">'
            "</head><body/></html>",
        ),
        Row(url="https://x.example/2", html="<html><body>bare</body></html>"),
    ]
    out = page_meta(spark.createDataFrame(rows))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["url"]: r for r in out.collect()}
    r1 = got["https://x.example/1"]
    assert r1["title"] == "Hi there"
    assert r1["lang_attr"] == "en-us"
    assert r1["charset"] == "utf-8"
    assert r1["noindex"] is True and r1["nofollow"] is False
    assert r1["canonical"] == "https://x.example/canon"
    # absent fields -> '' and false, never NULL
    r2 = got["https://x.example/2"]
    assert r2["title"] == "" and r2["lang_attr"] == "" and r2["charset"] == ""
    assert r2["noindex"] is False and r2["canonical"] == ""


def test_robots_parse_groups_and_edge_lines(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import parse_robots

    body = (
        "# hi\n"
        "User-agent: googlebot\n"
        "Disallow: /g-only\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /admin\n"
        "Allow: /admin/ok\n"
        "Disallow:\n"            # empty value: allow-all, NO rule
        "Crawl-delay: 10\n"      # unknown directive: skipped
        "User-agent: badbot\n"
        "Disallow: /\n"          # different group: ignored
    )
    rules = parse_robots(
        spark.createDataFrame([Row(host="h.example", robots_txt=body)])
    ).collect()
    got = {(r["allow"], r["path_prefix"]) for r in rules}
    assert got == {(False, "/admin"), (True, "/admin/ok")}
    assert all(r["rule_len"] == len(r["path_prefix"]) for r in rules)


def test_robots_filter_longest_match_and_default(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import parse_robots, robots_filter

    body = "User-agent: *\nDisallow: /a\nAllow: /a/b\nDisallow: /a/b\n"
    rules = parse_robots(
        spark.createDataFrame([Row(host="h.example", robots_txt=body)])
    )
    urls = spark.createDataFrame(
        [
            Row(url="https://h.example/a/x"),      # /a -> disallow
            Row(url="https://h.example/a/b/c"),    # tie at /a/b -> allow
            Row(url="https://h.example/other"),    # no match -> allow
            Row(url="https://h.example"),          # bare: path '/' -> allow
            Row(url="https://unknown.example/a"),  # no rules host -> allow
        ]
    )
    got = {
        r["url"]: r["fetch_allowed"]
        for r in robots_filter(urls, rules).collect()
    }
    assert got["https://h.example/a/x"] is False
    assert got["https://h.example/a/b/c"] is True  # allow wins the tie
    assert got["https://h.example/other"] is True
    assert got["https://h.example"] is True
    assert got["https://unknown.example/a"] is True


def test_sitemap_parse_block_pairing(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc> https://h.example/a </loc>"
        "<lastmod>2024-05-01</lastmod></url>"
        "<url><loc>https://h.example/b</loc></url>"       # no lastmod
        "<url><lastmod>2024-06-01</lastmod></url>"        # no loc: drop
        "</urlset>"
        "<sitemapindex><sitemap>"
        "<loc>https://h.example/more.xml</loc></sitemap></sitemapindex>"
    )
    got = {
        r["loc"]: r
        for r in parse_sitemap(
            spark.createDataFrame([Row(host="h.example", sitemap_xml=xml)])
        ).collect()
    }
    assert len(got) == 3
    # block-scoped pairing: /b must NOT inherit /a's (or the orphan's)
    # lastmod
    assert got["https://h.example/a"]["lastmod"] == "2024-05-01"
    assert got["https://h.example/b"]["lastmod"] == ""
    assert got["https://h.example/more.xml"]["is_index"] is True


def test_crawl_schedule_cap_and_ordering(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import (
        crawl_schedule,
        parse_robots,
        parse_sitemap,
    )

    xml = (
        "<urlset>"
        "<url><loc>https://h.example/old</loc>"
        "<lastmod>2023-01-01</lastmod></url>"
        "<url><loc>https://h.example/new</loc>"
        "<lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://h.example/undated</loc></url>"
        "<url><loc>https://h.example/admin/secret</loc>"
        "<lastmod>2025-01-01</lastmod></url>"
        "</urlset>"
    )
    entries = parse_sitemap(
        spark.createDataFrame([Row(host="h.example", sitemap_xml=xml)])
    )
    rules = parse_robots(
        spark.createDataFrame(
            [Row(host="h.example",
                 robots_txt="User-agent: *\nDisallow: /admin\n")]
        )
    )
    got = crawl_schedule(entries, rules, per_host_cap=2).collect()
    ranked = {r["fetch_rank"]: r["loc"] for r in got}
    # admin is robots-blocked even though freshest; undated sorts last
    assert ranked == {
        1: "https://h.example/new",
        2: "https://h.example/old",
    }


def test_template_clusters_structure_not_content(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import (
        dom_fingerprint,
        template_clusters,
    )

    rows = [
        Row(url="https://a/1", html="<div><p>totally different text</p></div>"),
        Row(url="https://a/2", html="<DIV><P>other words here</P></DIV>"),
        Row(url="https://a/3", html="<div><span>x</span></div>"),  # distinct
    ]
    df = spark.createDataFrame(rows)
    # same structure, case-insensitive; closing tags ignored
    fps = df.select(dom_fingerprint(F.col("html")).alias("f")).collect()
    assert fps[0]["f"] == fps[1]["f"] != fps[2]["f"]
    got = template_clusters(df).collect()
    assert len(got) == 1
    (c,) = got
    assert c["n_pages"] == 2 and c["example_url"] == "https://a/1"
    assert c["n_tags"] == 2


def test_parse_feed_rss_atom_fields(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import parse_feed

    rss = (
        "<rss><channel>"
        "<item><title>One &amp; two</title><link> http://a/1 </link>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
        "<item><title><b>rich</b> title</title><link>http://a/2</link></item>"
        "<item><title>linkless drops</title></item>"
        "</channel></rss>"
    )
    atom = (
        '<feed><entry><title>A1</title>'
        '<link rel="alternate" href="http://b/x"/>'
        "<updated>2024-05-01T00:00:00Z</updated></entry>"
        "<entry><title>no link</title></entry></feed>"
    )
    df = spark.createDataFrame(
        [Row(host="a", feed_xml=rss), Row(host="b", feed_xml=atom)]
    )
    got = {(r["host"], r["link"]): r for r in parse_feed(df).collect()}
    # linkless entries dropped on both kinds
    assert set(got) == {("a", "http://a/1"), ("a", "http://a/2"),
                        ("b", "http://b/x")}
    r1 = got[("a", "http://a/1")]
    # link whitespace-trimmed, date captured, entities left as-is
    assert r1["kind"] == "rss"
    assert r1["title"] == "One &amp; two"
    assert r1["published"] == "Mon, 01 Jan 2024 00:00:00 GMT"
    # inner markup stripped from titles; missing date is '' never NULL
    r2 = got[("a", "http://a/2")]
    assert r2["title"] == "rich title" and r2["published"] == ""
    r3 = got[("b", "http://b/x")]
    assert r3["kind"] == "atom"
    assert r3["published"] == "2024-05-01T00:00:00Z"


def test_og_jsonld_first_wins_and_census(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import og_jsonld

    html = (
        '<html><head>'
        '<meta property="og:title" content="First"/>'
        '<meta property="og:title" content="Second"/>'
        '<meta property="og:type" content="article"/>'
        '<script type="application/ld+json">'
        '{"@type": "Article", "author": {"@type": "Person"}, '
        '"also": {"@type": "Article"}}</script>'
        "</head></html>"
    )
    df = spark.createDataFrame(
        [Row(url="u1", html=html), Row(url="u2", html="<html></html>")]
    )
    got = {r["url"]: r for r in og_jsonld(df).collect()}
    # first match wins, like browsers/link-preview fetchers
    assert got["u1"]["og_title"] == "First"
    assert got["u1"]["og_type"] == "article"
    # sorted distinct @type names; absent fields '' never NULL
    assert got["u1"]["jsonld_types"] == "Article,Person"
    assert got["u1"]["og_image"] == "" and got["u1"]["has_structured"]
    assert got["u2"]["jsonld_types"] == ""
    assert not got["u2"]["has_structured"]


def test_og_jsonld_plan_is_shuffle_free(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import og_jsonld

    df = spark.createDataFrame([Row(url="u", html="<html></html>")])
    plan = og_jsonld(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_extract_links_resolution_branches(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import extract_links

    html = (
        '<a href="https://ext.example/page#frag">External <b>bold</b></a>'
        '<a href="/root/x">RootRel</a>'
        '<a href="sub/y.html">Rel</a>'
        '<a href="../up/z">Up</a>'
        '<a href="//cdn.example/lib.js">ProtoRel</a>'
        '<a href="mailto:x@y.z">Mail</a>'
        '<a href="javascript:void(0)">JS</a>'
        '<a href="#top">FragOnly</a>'
        '<a rel="external nofollow" href="https://spam.example/">NF</a>'
        '<a href="a/b/../../c/./d">Tricky</a>'
    )
    df = spark.createDataFrame(
        [Row(url="https://h.example/dir/sub/page.html?q=1", html=html)]
    )
    got = {r["href"]: r for r in extract_links(df).collect()}
    # mailto:/javascript:/fragment-only all drop — nothing to crawl
    assert len(got) == 7
    res = {h: r["abs_url"] for h, r in got.items()}
    assert res["https://ext.example/page#frag"] == "https://ext.example/page"
    assert res["/root/x"] == "https://h.example/root/x"
    # relative paths resolve against the base DIRECTORY, not the page
    assert res["sub/y.html"] == "https://h.example/dir/sub/sub/y.html"
    assert res["../up/z"] == "https://h.example/dir/up/z"
    # protocol-relative takes the base scheme
    assert res["//cdn.example/lib.js"] == "https://cdn.example/lib.js"
    # mixed ./ and ../ dot segments, RFC 3986 §5.2.4
    assert res["a/b/../../c/./d"] == "https://h.example/dir/sub/c/d"
    ext = got["https://ext.example/page#frag"]
    assert ext["anchor"] == "External bold" and not ext["is_internal"]
    assert got["https://spam.example/"]["nofollow"]
    assert got["/root/x"]["is_internal"]
    # the extraction itself adds no shuffle
    plan = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_host_outlinks_external_edges_only(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import extract_links, host_outlinks

    html = (
        '<a href="/internal">i</a>'
        '<a href="https://b.example/1">e1</a>'
        '<a href="https://b.example/2">e2</a>'
        '<a rel="nofollow" href="https://b.example/3">e3</a>'
    )
    df = spark.createDataFrame([Row(url="https://a.example/p", html=html)])
    got = host_outlinks(extract_links(df)).collect()
    assert len(got) == 1
    (e,) = got
    assert (e["src_host"], e["dst_host"]) == ("a.example", "b.example")
    # internal link excluded; nofollow counted in n_links but not n_follow
    assert (e["n_links"], e["n_follow"]) == (3, 2)


def test_robots_sitemaps_directives(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import robots_sitemaps

    body = (
        "User-agent: *\nDisallow: /x\n"
        "Sitemap: https://a/s.xml\n"
        "  sitemap: https://a/s2.xml  \n"     # indent + case + trail ws
        "Sitemap:\n"                           # blank value drops
        "# Sitemap: https://a/commented.xml\n"  # comment drops
    )
    df = spark.createDataFrame([Row(host="a", robots_txt=body),
                                Row(host="b", robots_txt="Allow: /")])
    got = sorted((r["host"], r["sitemap_url"])
                 for r in robots_sitemaps(df).collect())
    assert got == [("a", "https://a/s.xml"), ("a", "https://a/s2.xml")]


def test_pagination_links_first_wins(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import pagination_links

    html = ('<link rel="next" href="/2"><link rel="next" href="/DUP">'
            '<LINK rel="prev" href="/0">')
    df = spark.createDataFrame([Row(url="u1", html=html),
                                Row(url="u2", html="<p>x</p>")])
    got = {r["url"]: r for r in pagination_links(df).collect()}
    assert got["u1"]["next_url"] == "/2"       # first match wins
    assert got["u1"]["prev_url"] == "/0"       # case-insensitive tag
    assert got["u1"]["is_paginated"]
    assert got["u2"]["next_url"] == "" and not got["u2"]["is_paginated"]


def test_build_frontier_full_composition(spark):
    from narowi_ocr_spark.operators.urls import build_frontier, parse_robots

    cands = spark.createDataFrame(
        [
            ("h.example", "https://h.example/a"),        # known-cool url
            ("h.example", "https://h.example/b"),        # redirects to /bb
            ("h.example", "https://h.example/b"),        # dup discovery
            ("h.example", "https://h.example/admin/x"),  # robots-blocked
            ("h.example", "https://h.example/cyc"),      # redirect cycle
            ("h.example", "https://h.example/c"),        # unseen
            ("h.example", "https://h.example/d"),        # cap squeeze
        ],
        "host string, url string",
    )
    rules = parse_robots(spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /admin\n")],
        "host string, robots_txt string",
    ))
    redirs = spark.createDataFrame(
        [("https://h.example/b", "https://h.example/bb"),
         ("https://h.example/cyc", "https://h.example/cyc2"),
         ("https://h.example/cyc2", "https://h.example/cyc")],
        "src string, dst string",
    )
    recrawl = spark.createDataFrame(
        [("https://h.example/a", 900000)], "url string, change_ppm long"
    )
    got = build_frontier(cands, rules, redirects=redirs, recrawl=recrawl,
                         per_host_cap=3).orderBy("fetch_rank").collect()
    # hot url first; redirect rewritten+deduped; cycle and robots-blocked
    # gone; /d squeezed out by the cap (url-asc tie-break at the prior)
    assert [(r["url"], r["priority_ppm"], r["fetch_rank"]) for r in got] == [
        ("https://h.example/a", 900000, 1),
        ("https://h.example/bb", 750000, 2),
        ("https://h.example/c", 750000, 3),
    ]


def test_build_frontier_minimal_no_redirects_no_history(spark):
    from narowi_ocr_spark.operators.urls import build_frontier, parse_robots

    cands = spark.createDataFrame(
        [("h.example", "https://h.example/x")], "host string, url string"
    )
    rules = parse_robots(spark.createDataFrame(
        [("h.example", "User-agent: *\nAllow: /\n")],
        "host string, robots_txt string",
    ))
    got = build_frontier(cands, rules).collect()
    assert len(got) == 1
    assert got[0]["priority_ppm"] == 750000 and got[0]["fetch_rank"] == 1


def test_url_template_generalization(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import url_template

    cases = {
        "https://s.example/item/8841?x=1": "s.example/item/{n}",
        # adjacent numeric segments both generalize (two-pass sweep)
        "https://s.example/a/3/44/b": "s.example/a/{n}/{n}/b",
        "https://s.example/u/550e8400-e29b-41d4-a716-446655440000/p":
            "s.example/u/{uuid}/p",
        "https://s.example/h/deadbeefdeadbeefdeadbeef":
            "s.example/h/{hex}",
        "https://s.example/about": "s.example/about",
        "https://s.example": "s.example/",
    }
    df = spark.createDataFrame([Row(url=u) for u in cases])
    got = dict(
        (r["url"], r["t"])
        for r in df.select("url",
                           url_template(F.col("url")).alias("t")).collect()
    )
    assert got == cases


def test_robots_crawl_delay_values(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import robots_crawl_delay

    df = spark.createDataFrame([
        Row(host="a", robots_txt="User-agent: *\nCrawl-delay: 2\n"),
        Row(host="b", robots_txt="crawl-delay: 0.5\n"),
        Row(host="c", robots_txt="Crawl-delay: 1.2345\n"),  # ms truncate
        Row(host="d", robots_txt="User-agent: *\nDisallow: /x\n"),
    ])
    got = {r["host"]: r["crawl_delay_ms"]
           for r in robots_crawl_delay(df).collect()}
    assert got == {"a": 2000, "b": 500, "c": 1234}


def test_hidden_text_stats_detection(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import hidden_text_stats

    rows = [
        Row(url="u1", html='<p>0123456789</p>'
            '<div style="a;display:none">hidden <b>ten</b></div>'),
        Row(url="u2", html='<span style="visibility: hidden">ghost</span>'),
        Row(url="u3", html="<p>clean</p>"),
    ]
    got = {r["url"]: r for r in
           hidden_text_stats(spark.createDataFrame(rows)).collect()}
    u1 = got["u1"]
    # inner markup stripped before counting: 'hidden ten' = 10 chars
    assert (u1["n_hidden_blocks"], u1["hidden_chars"],
            u1["visible_chars"]) == (1, 10, 10)
    assert u1["hidden_ppm"] == 500000
    assert got["u2"]["hidden_ppm"] == 1000000
    assert got["u3"]["hidden_ppm"] == 0 and got["u3"]["n_hidden_blocks"] == 0


def test_hreflang_alternates_block_scoped(spark):
    from pyspark.sql import Row

    from narowi_ocr_spark.operators.urls import hreflang_alternates

    html = (
        '<link rel="alternate" hreflang="de" href="https://s/de"/>'
        '<link hreflang="FR" rel="alternate" href="https://s/fr"/>'  # order
        '<link rel="stylesheet" href="/x.css"/>'                      # decoy
        '<link rel="alternate" hreflang="" href="/bad"/>'             # blank
        '<link rel="alternate" hreflang="es">'                        # no href
    )
    df = spark.createDataFrame([Row(url="u", html=html)])
    got = sorted((r["lang"], r["alt_url"])
                 for r in hreflang_alternates(df).collect())
    assert got == [("de", "https://s/de"), ("fr", "https://s/fr")]


def test_shard_assign_no_shard_only_window(spark):
    """Scale shape: the full-table rank window must be partitioned by
    (shard, sub-bucket), never by shard alone (a 16-way partition would
    funnel corpus/16 rows through single tasks at 10^12 docs)."""
    from narowi_ocr_spark.operators.shards import shard_assign

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    plan = (
        shard_assign(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = [
        ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
    ]
    assert specs, plan
    # every window over the data table carries the sub-bucket key; the
    # offsets window runs over the tiny count table (also shard+_sub)
    assert all("_sub" in s for s in specs), plan

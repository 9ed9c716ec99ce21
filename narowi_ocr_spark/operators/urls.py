"""URL canonicalization for crawl curation: fragment/tracking-param
stripping, host normalization, and registered-domain extraction.

Why this is a first-class op in a web-scale pipeline: crawl frontiers
and dedup keys are URL-keyed, and the same page is fetched under
dozens of spellings (case-variant hosts, utm_* tracking params,
fragments, default ports, shuffled query order). Canonicalizing BEFORE
the URL-keyed shuffle collapses those spellings into one key, which
both shrinks the dedup state and defuses the per-host skew that raw
URLs carry.

Scale shape: every function here is a pure Catalyst expression chain
(regexp_extract / split / filter / array_sort / concat) — narrow,
whole-stage-codegen'd, zero Python at runtime, usable inside any
existing stage without adding a shuffle.

The registered-domain step uses a deliberately small built-in
multi-label-suffix table (the public-suffix list is ~10k entries; at
production scale you'd broadcast-join the full PSL — the expression
shape is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from narowi_ocr_spark.functions.native import bind_once

# Query params that identify a tracking/attribution spelling, not a
# distinct resource. Case-sensitive by design (the canonical utm_*
# params are lowercase; an 'UTM_X' param is somebody's API, keep it).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

# Multi-label public suffixes the registered-domain heuristic knows.
MULTI_LABEL_SUFFIXES = [
    "co.uk",
    "org.uk",
    "ac.uk",
    "com.au",
    "net.au",
    "co.jp",
    "co.in",
    "com.br",
    "co.nz",
    "com.cn",
]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _pre_query(u: Column) -> Column:
    return F.regexp_replace(F.regexp_replace(u, r"#.*$", ""), r"\?.*$", "")


def url_query(u: Column) -> Column:
    """Raw query string ('' when absent), fragment already stripped."""
    return F.regexp_extract(F.regexp_replace(u, r"#.*$", ""), r"\?(.*)$", 1)


def url_scheme(u: Column) -> Column:
    return F.lower(F.regexp_extract(_pre_query(u), _SCHEME_RE, 1))


def _authority(u: Column) -> Column:
    return F.regexp_extract(_pre_query(u), _SCHEME_RE + r"([^/]*)", 2)


def url_host(u: Column) -> Column:
    """Lowercased host with any :port suffix removed."""
    return F.lower(F.regexp_replace(_authority(u), r":\d+$", ""))


def url_port(u: Column) -> Column:
    """Explicit port as a string ('' when absent)."""
    return F.regexp_extract(_authority(u), r":(\d+)$", 1)


def url_path(u: Column) -> Column:
    """Path starting at '/'; '' when absent (normalized to '/' by
    :func:`canonical_url`)."""
    return F.regexp_extract(_pre_query(u), _SCHEME_RE + r"[^/]*(/.*)?$", 2)


def clean_query(u: Column) -> Column:
    """Sorted '&'-joined query params with tracking params removed;
    '' when nothing survives. Sorting makes param order canonical
    (byte order — identical in Spark's array_sort and DuckDB's
    list_sort); duplicate keys are preserved."""
    parts = F.filter(
        F.split(url_query(u), "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
    )
    return F.array_join(F.array_sort(parts), "&")


def canonical_url(u: Column) -> Column:
    """One canonical spelling per resource: lowercase scheme+host, no
    fragment, default ports (http:80 / https:443) dropped, '' path →
    '/', tracking params removed, remaining params byte-sorted."""
    scheme = url_scheme(u)
    port = url_port(u)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = url_path(u)
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    q = clean_query(u)
    q_part = F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    return F.concat(
        scheme, F.lit("://"), url_host(u), port_part, path_part, q_part
    )


def registered_domain(host: Column) -> Column:
    """eTLD+1 under the built-in suffix table: last 2 labels, or last 3
    when the last 2 form a known multi-label suffix (bbc.co.uk, not
    co.uk). Single-label hosts (localhost) pass through unchanged.
    The label array binds once per row — each of the six references is
    a lambda-variable lookup, not a re-split."""

    def build(labels: Column) -> Column:
        n = F.size(labels)
        last2 = F.concat_ws(
            ".", F.element_at(labels, -2), F.element_at(labels, -1)
        )
        last3 = F.concat_ws(
            ".",
            F.element_at(labels, -3),
            F.element_at(labels, -2),
            F.element_at(labels, -1),
        )
        is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
        return (
            F.when(n <= 1, F.array_join(labels, "."))
            .when((n >= 3) & is_multi, last3)
            .otherwise(last2)
        )

    return bind_once(F.split(host, r"\."), build)


def url_struct(u: Column) -> Column:
    """Every parsed + canonical part as ONE struct column:
    (scheme, host, port, path, query, norm_url, reg_domain).

    This is the form to use when deriving several URL columns at once:
    the scalar helpers above are independent Columns, so a SELECT that
    uses five of them re-runs the shared base regexes five times after
    CollapseProject re-inlines them (no common-subexpression
    elimination in interpreted projections). Here each stage binds once
    (``bind_once``): fragment-strip runs once, authority/scheme/path
    extraction once, and every downstream reference is an O(1) lambda-
    variable lookup.
    """
    base = F.regexp_replace(u, r"#.*$", "")
    pre = F.struct(
        F.regexp_replace(base, r"\?.*$", "").alias("prequery"),
        F.regexp_extract(base, r"\?(.*)$", 1).alias("qs"),
    )

    def outer(b: Column) -> Column:
        prequery = b["prequery"]
        parts = F.filter(
            F.split(b["qs"], "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
        auth = F.regexp_extract(prequery, _SCHEME_RE + r"([^/]*)", 2)
        mid = F.struct(
            F.lower(F.regexp_extract(prequery, _SCHEME_RE, 1)).alias(
                "scheme"
            ),
            F.lower(F.regexp_replace(auth, r":\d+$", "")).alias("host"),
            F.regexp_extract(auth, r":(\d+)$", 1).alias("port"),
            F.regexp_extract(
                prequery, _SCHEME_RE + r"[^/]*(/.*)?$", 2
            ).alias("path"),
            F.array_join(F.array_sort(parts), "&").alias("query"),
        )

        def inner(c: Column) -> Column:
            scheme, host, port = c["scheme"], c["host"], c["port"]
            default_port = ((scheme == "http") & (port == "80")) | (
                (scheme == "https") & (port == "443")
            )
            norm = F.concat(
                scheme,
                F.lit("://"),
                host,
                F.when(
                    (port != "") & ~default_port,
                    F.concat(F.lit(":"), port),
                ).otherwise(F.lit("")),
                F.when(c["path"] == "", F.lit("/")).otherwise(c["path"]),
                F.when(
                    c["query"] != "", F.concat(F.lit("?"), c["query"])
                ).otherwise(F.lit("")),
            )
            return F.struct(
                scheme.alias("scheme"),
                host.alias("host"),
                port.alias("port"),
                c["path"].alias("path"),
                c["query"].alias("query"),
                norm.alias("norm_url"),
                registered_domain(host).alias("reg_domain"),
            )

        return bind_once(mid, inner)

    return bind_once(pre, outer)


def with_url_parts(
    df: DataFrame, url_col: str = "url", out_col: str = "url_parts"
) -> DataFrame:
    """Stage :func:`url_struct` as a column — the multi-output form of
    URL canonicalization (one parse per row, N outputs)."""
    return df.withColumn(out_col, url_struct(F.col(url_col)))


def url_filter(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    blocked_url_res: list[str] | None = None,
) -> DataFrame:
    """Crawl-policy URL gate: drop documents whose registered domain is
    on the blocklist or whose raw URL matches any banned pattern
    (tracking redirectors, admin paths, binary endpoints, …).

    The domain gate is a broadcast LEFT ANTI join — a blocklist is
    thousands-to-millions of rows, broadcast-sized by construction, so
    the corpus never shuffles; the pattern gate is pure codegen rlike
    conjunctions in the same stage. Output keeps the input columns plus
    ``reg_domain`` (downstream per-domain ops reuse the parse).

    NULL urls are dropped up front — a policy gate cannot vet an
    unparseable URL, and leaving them in would make their fate depend
    on whether any pattern ban happens to be configured (NULL passes an
    anti-join but fails ``~rlike``)."""
    df = df.where(F.col(url_col).isNotNull())
    staged = df.withColumn("_p", url_struct(F.col(url_col)))
    staged = staged.withColumn("reg_domain", F.col("_p.reg_domain")).drop("_p")
    kept = staged.join(F.broadcast(blocklist), "reg_domain", "left_anti")
    for pat in blocked_url_res or []:
        kept = kept.where(~F.col(url_col).rlike(pat))
    return kept


# ------------------------------------------------- anchor-text aggregation

# href + anchor body of an <a> element. Lazy body, no newline crossing —
# identical semantics under java.util.regex (Spark) and RE2 (DuckDB):
# both treat '.' as not-newline and support (?i) and lazy quantifiers.
ANCHOR_RE = r'(?i)<a\s[^>]*href="([^"]*)"[^>]*>(.*?)</a>'


def anchor_texts(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-target anchor-text aggregation — the classic web-graph
    signal (how OTHER pages describe a page; search engines rank with
    it, curation pipelines use it as an off-page quality/topic label).

    Extracts every ``<a href>`` from the raw html, resolves absolute
    and root-relative targets against the source page's origin (other
    relative forms are dropped — documented subset), folds the anchor
    body (inner tags stripped, whitespace-trimmed, case-folded), and
    aggregates per target:

      (target, n_refs, n_src_pages, top_anchor, top_anchor_refs)

    where top_anchor is the most frequent folded anchor text, ties
    broken by lexicographically-largest text — fully deterministic,
    no arg_max nondeterminism.

    Scale shape: link extraction is a pure-codegen
    ``regexp_extract_all`` projection (no Python, no pre-shuffle); the
    exploded (target, src, anchor) stream partial-aggregates before
    both target-keyed shuffles, and anchors are typically tiny strings
    — the raw html never leaves its scan stage. Self-links are kept
    (they are real references); pages with no links simply emit
    nothing. Reference analogue: blocks.py's link-density signal uses
    the SAME <a> census per page; this is its graph-transposed twin.
    """
    hrefs = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 1)
    bodies = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), 2)
    origin = F.regexp_extract(F.col(url_col), r"^(https?://[^/]+)", 1)
    pairs = (
        df.select(
            F.col(url_col).alias("src"),
            origin.alias("_origin"),
            F.explode(F.arrays_zip(hrefs.alias("href"),
                                   bodies.alias("body"))).alias("z"),
        )
        .select(
            "src",
            F.when(
                F.col("z.href").startswith("http"), F.col("z.href")
            )
            .when(
                F.col("z.href").startswith("/"),
                F.concat(F.col("_origin"), F.col("z.href")),
            )
            .alias("target"),
            F.lower(
                F.trim(F.regexp_replace(F.col("z.body"), "<[^>]*>", ""))
            ).alias("anchor"),
        )
        .where(F.col("target").isNotNull() & (F.col("target") != ""))
    )
    per_target = pairs.groupBy("target").agg(
        F.count("*").cast("long").alias("n_refs"),
        F.count_distinct("src").cast("long").alias("n_src_pages"),
    )
    per_anchor = pairs.groupBy("target", "anchor").agg(
        F.count("*").cast("long").alias("_cnt")
    )
    maxcnt = per_anchor.groupBy("target").agg(F.max("_cnt").alias("_mx"))
    top = (
        per_anchor.join(maxcnt, "target")
        .where(F.col("_cnt") == F.col("_mx"))
        .groupBy("target")
        .agg(
            F.max("anchor").alias("top_anchor"),
            F.max("_mx").cast("long").alias("top_anchor_refs"),
        )
    )
    return per_target.join(top, "target")


# ------------------------------------------------- page metadata census

# All RE2-safe (no backreferences/lookaheads) so java.util.regex and
# DuckDB agree; both engines return '' for a no-match group.
TITLE_RE = r"(?i)<title[^>]*>(.*?)</title>"
HTMLLANG_RE = r'(?i)<html[^>]*\slang="([^"]*)"'
CHARSET_RE = r'(?i)<meta[^>]*charset="?([A-Za-z0-9_\-]+)'
ROBOTS_RE = r'(?i)<meta[^>]*name="robots"[^>]*content="([^"]*)"'
CANONICAL_RE = r'(?i)<link[^>]*rel="canonical"[^>]*href="([^"]*)"'


def page_meta(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page HTML metadata census — the fields a crawl-curation
    pipeline reads BEFORE content extraction: <title> (inner tags
    stripped, trimmed), <html lang>, declared charset, robots
    noindex/nofollow directives (pages a polite corpus must drop), and
    the canonical link target (the dedup key the site itself declares
    — feeding the url_frontier/canonical-dedup ops upstream of any
    content hash).

    Returns (url, title, lang_attr, charset, noindex, nofollow,
    canonical); absent fields are '' (flags false), never NULL, so
    downstream grouping is total.

    Scale shape: six pure-codegen regexp_extract projections over the
    html scan — no shuffle, no Python, column-pruned to nothing when a
    caller selects a subset. First match wins for each field, matching
    browser behavior. Reference analogue: the pre-OCR header probe of
    image dimensions/mode (image_processor.py:62-80) — cheap metadata
    read before the expensive recognition pass.
    """
    h = F.col(html_col)
    robots = F.lower(F.regexp_extract(h, ROBOTS_RE, 1))
    return df.select(
        F.col(url_col).alias("url"),
        F.trim(
            F.regexp_replace(
                F.regexp_extract(h, TITLE_RE, 1), "<[^>]*>", ""
            )
        ).alias("title"),
        F.lower(F.regexp_extract(h, HTMLLANG_RE, 1)).alias("lang_attr"),
        F.lower(F.regexp_extract(h, CHARSET_RE, 1)).alias("charset"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        F.regexp_extract(h, CANONICAL_RE, 1).alias("canonical"),
    )


# ------------------------------------------------- robots.txt politeness

def parse_robots(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Parse robots.txt bodies into a (host, allow, path_prefix,
    rule_len) rule table — the crawl-politeness input every fetch
    frontier joins against (RFC 9309). Group semantics: a rule line
    belongs to the most recent ``User-agent:`` line above it; only the
    ``*`` group is kept (a per-product agent string is a parameter
    swap). ``Allow``/``Disallow`` values are used verbatim as path
    prefixes; an empty-valued ``Disallow:`` means allow-everything per
    the RFC and contributes no rule; comments and unknown directives
    are skipped.

    Scale shape: one posexplode over lines + a per-host ordered window
    to resolve the governing user-agent (robots bodies are a few KB —
    the per-host partition is trivially small), then a pure filter.
    The output rule table is tiny relative to any corpus and is meant
    to be BROADCAST into robots_filter.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("idx", "ln"),
    ).select("host", "idx", F.trim(F.col("ln")).alias("ln"))
    low = F.lower(F.col("ln"))
    ua_val = F.when(
        low.startswith("user-agent:"),
        F.trim(F.substring(F.col("ln"), 12, 10000)),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cur = lines.select(
        "host",
        "idx",
        "ln",
        low.alias("_low"),
        F.last(ua_val, ignorenulls=True).over(w).alias("_ua"),
    )
    rule_val = F.when(
        F.col("_low").startswith("allow:"),
        F.struct(
            F.lit(True).alias("allow"),
            F.trim(F.substring(F.col("ln"), 7, 10000)).alias("p"),
        ),
    ).when(
        F.col("_low").startswith("disallow:"),
        F.struct(
            F.lit(False).alias("allow"),
            F.trim(F.substring(F.col("ln"), 10, 10000)).alias("p"),
        ),
    )
    return (
        cur.where(F.col("_ua") == "*")
        .select("host", rule_val.alias("_r"))
        .where(F.col("_r").isNotNull() & (F.col("_r.p") != ""))
        .select(
            "host",
            F.col("_r.allow").alias("allow"),
            F.col("_r.p").alias("path_prefix"),
            F.length("_r.p").cast("int").alias("rule_len"),
        )
    )


def robots_filter(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Apply a parsed robots rule table to a URL set: RFC 9309
    longest-match — the most specific (longest) matching prefix rule
    decides, Allow winning prefix-length ties; a URL with no matching
    rule is allowed. Returns the input plus ``fetch_allowed``.

    Scale shape: the rule table broadcasts (robots rules are per-host
    and tiny; the corpus side never shuffles); prefix matching is a
    codegen ``startswith`` residual on the host-equi broadcast join,
    and the per-URL verdict is ONE partial-aggregated max over packed
    (rule_len, allow) — longest-match as an integer max, no window, no
    sort.
    """
    host = F.regexp_extract(F.col(url_col), r"^https?://([^/]+)", 1)
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(F.col(url_col), r"^https?://[^/]+(/.*)$", 1),
            F.lit(""),
        ),
        F.lit("/"),
    )
    u = urls.select(
        F.col(url_col).alias("url"),
        host.alias("_h"),
        path.alias("_p"),
    )
    j = u.join(
        F.broadcast(rules),
        (F.col("_h") == F.col("host"))
        & F.col("_p").startswith(F.col("path_prefix")),
        "left",
    )
    # packed verdict: longer rule wins; at equal length allow (1) beats
    # disallow (0) — pack as rule_len*2 + allow so ONE max decides both
    packed = F.when(
        F.col("rule_len").isNotNull(),
        F.col("rule_len") * 2 + F.col("allow").cast("int"),
    )
    return (
        j.groupBy("url")
        .agg(F.max(packed).alias("_best"))
        .select(
            "url",
            F.coalesce(F.col("_best") % 2 == 1, F.lit(True)).alias(
                "fetch_allowed"
            ),
        )
    )


# ------------------------------------------------- sitemap + frontier

# (?s): <url> blocks span lines; dotall is spelled the same in
# java.util.regex and RE2.
SITEMAP_URL_RE = r"(?s)<url>(.*?)</url>"
SITEMAP_IDX_RE = r"(?s)<sitemap>(.*?)</sitemap>"
LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemap(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap.xml bodies (sitemaps.org protocol) into one row
    per entry: (host, loc, lastmod, is_index) — ``is_index`` marks
    <sitemapindex> children (nested sitemaps a fetcher must recurse
    into) vs plain <urlset> page entries. ``lastmod`` is '' when the
    optional tag is absent; entries with no <loc> are dropped
    (malformed per the protocol).

    Scale shape: two pure-codegen regexp_extract_all projections (url
    blocks, index blocks) + one explode each — block-scoped extraction
    keeps loc/lastmod pairing correct even when lastmod is sporadic
    (a positional zip of independent global extracts would misalign).
    No shuffle, no Python.
    """
    def entries(block_re: str, is_index: bool):
        return (
            df.select(
                F.col(host_col).alias("host"),
                F.explode(
                    F.regexp_extract_all(
                        F.col(xml_col), F.lit(block_re), 1
                    )
                ).alias("blk"),
            )
            .select(
                "host",
                F.regexp_extract(F.col("blk"), LOC_RE, 1).alias("loc"),
                F.regexp_extract(F.col("blk"), LASTMOD_RE, 1).alias(
                    "lastmod"
                ),
                F.lit(is_index).alias("is_index"),
            )
            .where(F.col("loc") != "")
        )

    return entries(SITEMAP_URL_RE, False).unionByName(
        entries(SITEMAP_IDX_RE, True)
    )


def crawl_schedule(
    entries: DataFrame,
    rules: DataFrame,
    per_host_cap: int = 5,
) -> DataFrame:
    """Politeness-capped fetch schedule: sitemap page entries →
    robots longest-match filter → per-host top-``per_host_cap`` by
    freshness (lastmod desc, '' last, loc asc tie-break). Returns
    (host, loc, lastmod, fetch_rank) — the batch a polite fetcher
    issues per host per cycle.

    Scale shape: the robots verdict reuses ``robots_filter`` (rule
    table broadcast, no corpus shuffle); the cap is a per-HOST window
    — bounded partitions by construction (a host's sitemap is capped
    at 50k entries by the protocol), so the rank never degenerates
    into a global sort; Spark 4 plan-rewrites the rank<=cap into
    WindowGroupLimit partial pushdown.
    """
    pages = entries.where(~F.col("is_index")).select(
        "host", "loc", "lastmod"
    )
    verdicts = robots_filter(
        pages.select(F.col("loc").alias("url")), rules
    )
    allowed = pages.join(
        verdicts.where(F.col("fetch_allowed")).select(
            F.col("url").alias("loc")
        ),
        "loc",
        "left_semi",
    )
    w = Window.partitionBy("host").orderBy(
        F.col("lastmod") == "", F.col("lastmod").desc(), F.col("loc")
    )
    return (
        allowed.withColumn(
            "fetch_rank", F.row_number().over(w).cast("int")
        )
        .where(F.col("fetch_rank") <= per_host_cap)
        .select("host", "loc", "lastmod", "fetch_rank")
    )


# ------------------------------------------------- DOM template clusters

TAG_SEQ_RE = r"(?i)<([a-zA-Z][a-zA-Z0-9]*)"


def dom_fingerprint(html: Column) -> Column:
    """Layout fingerprint: md5 over the page's lowercased tag-name
    sequence (order-preserving, text content ignored). Two pages from
    the same template engine collide here even when their text is
    completely different — the structural complement of the content
    hashes every dedup op in this repo keys on. Pure codegen."""
    tags = F.transform(
        F.regexp_extract_all(html, F.lit(TAG_SEQ_RE), 1),
        F.lower,
    )
    return F.md5(F.array_join(tags, ">"))


def template_clusters(
    df: DataFrame, url_col: str = "url", html_col: str = "html",
    min_pages: int = 2,
) -> DataFrame:
    """Group pages by DOM-structure fingerprint and keep clusters with
    >= ``min_pages`` members — the template-farm census (SEO farms and
    mirror networks generate thousands of structurally identical pages
    with rotated text; content dedup misses them by design, structure
    dedup catches them).

    Returns (template_fp, n_pages, n_tags, example_url) — n_tags from
    the deterministic min-url member, example_url the lexicographically
    smallest member.

    Scale shape: the fingerprint is one codegen projection at the
    scan; only (fp, url, n_tags) triples shuffle into a single
    partial-aggregated groupBy. Hot templates (millions of pages) are
    exactly what partial aggregation flattens — per-partition combines
    reduce each template to one row per task before the exchange.
    """
    h = F.col(html_col)
    staged = df.select(
        F.col(url_col).alias("url"),
        dom_fingerprint(h).alias("template_fp"),
        F.size(F.regexp_extract_all(h, F.lit(TAG_SEQ_RE), 1))
        .cast("int")
        .alias("n_tags"),
    )
    return (
        staged.groupBy("template_fp")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.min(F.struct("url", "n_tags")).alias("_m"),
        )
        .where(F.col("n_pages") >= min_pages)
        .select(
            "template_fp",
            "n_pages",
            F.col("_m.n_tags").alias("n_tags"),
            F.col("_m.url").alias("example_url"),
        )
    )


# ------------------------------------------------- RSS/Atom feed parse

# Block-scoped like the sitemap parser: fields are extracted from each
# <item>/<entry> capture so sporadic optional tags (pubDate, updated)
# can never misalign across entries. All RE2-safe.
RSS_ITEM_RE = r"(?s)<item>(.*?)</item>"
ATOM_ENTRY_RE = r"(?s)<entry>(.*?)</entry>"
FEED_TITLE_RE = r"(?s)<title>\s*(.*?)\s*</title>"
RSS_LINK_RE = r"(?s)<link>\s*(.*?)\s*</link>"
ATOM_LINK_RE = r'(?i)<link[^>]*href="([^"]*)"'
RSS_DATE_RE = r"(?s)<pubDate>\s*(.*?)\s*</pubDate>"
ATOM_DATE_RE = r"(?s)<updated>\s*(.*?)\s*</updated>"


def parse_feed(
    df: DataFrame, host_col: str = "host", xml_col: str = "feed_xml"
) -> DataFrame:
    """Parse RSS 2.0 / Atom feed bodies into one row per entry:
    (host, kind, link, title, published) — ``kind`` is 'rss' for
    <item> blocks, 'atom' for <entry> blocks (a body carrying both is
    parsed for both, matching how a tolerant fetcher treats mislabeled
    feeds). ``published`` is <pubDate> (RSS) / <updated> (Atom), '' when
    absent; entries with no resolvable link are dropped (nothing to
    fetch). Feeds are the crawl-discovery channel that surfaces NEW
    urls hours before sitemaps regenerate — the freshness complement of
    ``parse_sitemap`` upstream of ``crawl_schedule``.

    Scale shape: two pure-codegen regexp_extract_all projections + one
    explode each, exactly the sitemap parser's shape — no shuffle, no
    Python, and the per-host feed body is KB-scale so the explode
    fan-out is bounded by protocol (RSS convention caps feeds at tens
    of entries). Reference analogue: the frame-list probe that seeds
    the per-image OCR loop (src/processing/image_processor.py:62-80) —
    a cheap manifest read ahead of the expensive extraction pass.
    """
    def entries(block_re: str, kind: str, link_re: str, date_re: str):
        return (
            df.select(
                F.col(host_col).alias("host"),
                F.explode(
                    F.regexp_extract_all(
                        F.col(xml_col), F.lit(block_re), 1
                    )
                ).alias("blk"),
            )
            .select(
                "host",
                F.lit(kind).alias("kind"),
                F.regexp_extract(F.col("blk"), link_re, 1).alias("link"),
                F.trim(
                    F.regexp_replace(
                        F.regexp_extract(F.col("blk"), FEED_TITLE_RE, 1),
                        "<[^>]*>",
                        "",
                    )
                ).alias("title"),
                F.regexp_extract(F.col("blk"), date_re, 1).alias(
                    "published"
                ),
            )
            .where(F.col("link") != "")
        )

    return entries(RSS_ITEM_RE, "rss", RSS_LINK_RE, RSS_DATE_RE).unionByName(
        entries(ATOM_ENTRY_RE, "atom", ATOM_LINK_RE, ATOM_DATE_RE)
    )


# ------------------------------------------------- structured data census

OG_PROPS = ("title", "type", "image", "url")
JSONLD_TYPE_RE = r'"@type"\s*:\s*"([A-Za-z]+)"'


def og_jsonld(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Structured-data census: OpenGraph meta properties (og:title,
    og:type, og:image, og:url — first match wins, like browsers and
    link-preview fetchers) plus the sorted distinct schema.org @type
    names found in JSON-LD script blocks, comma-joined. These are the
    machine-readable labels a training-data pipeline uses to type pages
    (Article vs Product vs Recipe) WITHOUT running content extraction —
    the cheap router ahead of the expensive Arrow stage.

    Returns (url, og_title, og_type, og_image, og_url, jsonld_types,
    has_structured) — absent fields '', never NULL, so grouping is
    total; ``has_structured`` flags pages carrying either signal.

    Scale shape: five codegen regexp projections + one
    regexp_extract_all/array_sort over the html scan — no shuffle, no
    Python, column-pruned away when unused. Reference analogue: the
    pre-OCR image-header probe (image_processor.py:62-80) — typed
    metadata read before recognition.
    """
    h = F.col(html_col)

    def og(prop: str) -> Column:
        return F.regexp_extract(
            h,
            r'(?i)<meta[^>]*property="og:' + prop + r'"[^>]*content="([^"]*)"',
            1,
        )

    types = F.array_join(
        F.array_sort(
            F.array_distinct(
                F.regexp_extract_all(h, F.lit(JSONLD_TYPE_RE), 1)
            )
        ),
        ",",
    )
    ogc = {p: og(p) for p in OG_PROPS}
    return df.select(
        F.col(url_col).alias("url"),
        ogc["title"].alias("og_title"),
        ogc["type"].alias("og_type"),
        ogc["image"].alias("og_image"),
        ogc["url"].alias("og_url"),
        types.alias("jsonld_types"),
        (
            (ogc["title"] != "") | (ogc["type"] != "")
            | (ogc["image"] != "") | (ogc["url"] != "")
            | (types != "")
        ).alias("has_structured"),
    )


# ------------------------------------------------- outlink extraction

A_BLOCK_RE = r"(?is)(<a\s[^>]*>.*?</a>)"
HREF_RE = r'(?is)<a\s[^>]*href\s*=\s*"([^"]*)"'
ANCHOR_INNER_RE = r"(?is)^<a\s[^>]*>(.*)</a>$"
NOFOLLOW_RE = r'(?is)<a\s[^>]*rel\s*=\s*"[^"]*nofollow'
ABS_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:"


def _remove_dot_segments(path: Column, depth: int = 4) -> Column:
    """RFC 3986 §5.2.4 dot-segment removal as a bounded pass chain —
    RE2-safe (no lookaround), so a SQL oracle can mirror it keystroke
    for keystroke. ``depth`` bounds the '..' nesting handled (real
    pages rarely exceed 2); each pass is a global left-to-right
    replace, which both java.util.regex and RE2 apply identically.
    """
    p = path
    for _ in range(2):  # '/./' collapses ('/././' needs two passes)
        p = F.regexp_replace(p, r"/\./", "/")
    p = F.regexp_replace(p, r"/\.$", "/")
    for _ in range(depth):  # '/seg/../' pops one level per pass
        p = F.regexp_replace(p, r"/[^/]+/\.\./", "/")
    p = F.regexp_replace(p, r"/[^/]+/\.\.$", "/")
    # '..' left at the root resolves to the root, per spec
    p = F.regexp_replace(p, r"^(/\.\.)+(/|$)", "/")
    return p


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Extract <a href> outlinks and resolve them against the page URL:
    one row per anchor, (url, href, abs_url, anchor, nofollow,
    is_internal). This is the operator that turns a page corpus into
    the LINK GRAPH the PageRank/HITS/anchor-text family consumes — the
    crawl-frontier feeder and the spam/authority signal source.

    Resolution (RFC 3986 subset, documented bounds):
    - fragments are stripped; fragment-only hrefs drop (self links);
    - absolute http(s) hrefs pass through; other schemes (javascript:,
      mailto:, data:) drop — nothing to crawl;
    - '//host/p' takes the base scheme; '/p' takes scheme://host;
      relative paths resolve against the base directory with
      dot-segment removal bounded at 4 levels of '../';
    - ``anchor`` is the inner text, tags stripped, whitespace-trimmed;
      ``nofollow`` reads rel="...nofollow..."; ``is_internal``
      compares lowercased hosts.

    Scale shape: one regexp_extract_all + explode over the html scan,
    then pure codegen regex projections — no shuffle, no Python; the
    downstream host-graph groupBy is the first exchange, keyed on the
    (salted if hot) host. Reference analogue: the ROI-detect step that
    turns a frame into the list of regions the recognize loop consumes
    (src/processing/image_processor.py:82-129) — here a page into the
    list of edges the graph ops consume.
    """
    a = F.col("_a")
    base = F.col("_u")
    blocks = df.select(
        F.col(url_col).alias("_u"),
        F.explode(
            F.regexp_extract_all(F.col(html_col), F.lit(A_BLOCK_RE), 1)
        ).alias("_a"),
    )
    href = F.regexp_extract(a, HREF_RE, 1)
    # base parts (query/fragment-free)
    b0 = F.regexp_replace(F.regexp_replace(base, r"#.*$", ""), r"\?.*$", "")
    scheme = F.lower(F.regexp_extract(b0, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    bhost = F.lower(
        F.regexp_replace(
            F.regexp_extract(b0, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1),
            r":\d+$", "",
        )
    )
    origin = F.regexp_extract(b0, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)
    bpath = F.regexp_extract(b0, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$", 1)
    bdir = F.regexp_replace(
        F.when(bpath == "", F.lit("/")).otherwise(bpath), r"[^/]*$", ""
    )
    # href with fragment stripped
    h0 = F.regexp_replace(href, r"#.*$", "")
    is_abs = h0.rlike(ABS_SCHEME_RE)
    raw_path = (
        F.when(h0.startswith("/"), h0)
        .otherwise(F.concat(bdir, h0))
    )
    abs_url = (
        F.when(h0 == "", F.lit(None).cast("string"))
        .when(is_abs & h0.rlike(r"(?i)^https?://"), h0)
        .when(is_abs, F.lit(None).cast("string"))
        .when(h0.startswith("//"), F.concat(scheme, F.lit(":"), h0))
        .otherwise(F.concat(origin, _remove_dot_segments(raw_path)))
    )
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_extract(a, ANCHOR_INNER_RE, 1), "<[^>]*>", ""
        )
    )
    lhost = F.lower(
        F.regexp_replace(
            F.regexp_extract(abs_url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1),
            r":\d+$", "",
        )
    )
    return (
        blocks.select(
            base.alias("url"),
            href.alias("href"),
            abs_url.alias("abs_url"),
            anchor.alias("anchor"),
            a.rlike(NOFOLLOW_RE).alias("nofollow"),
            (lhost == bhost).alias("is_internal"),
        )
        .where(F.col("abs_url").isNotNull())
    )


def host_outlinks(links: DataFrame) -> DataFrame:
    """Collapse ``extract_links`` output into weighted host-graph edges
    (src_host, dst_host, n_links, n_follow) — external links only; the
    aggregation is the pipeline's FIRST shuffle and its output is
    hosts², tiny next to the page table, so everything downstream
    (PageRank, HITS, reciprocity) runs on a broadcastable table."""
    src = F.lower(
        F.regexp_replace(
            F.regexp_extract(F.col("url"),
                             r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1),
            r":\d+$", "",
        )
    )
    dst = F.lower(
        F.regexp_replace(
            F.regexp_extract(F.col("abs_url"),
                             r"^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)", 1),
            r":\d+$", "",
        )
    )
    return (
        links.where(~F.col("is_internal"))
        .groupBy(src.alias("src_host"), dst.alias("dst_host"))
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.sum(F.when(~F.col("nofollow"), 1).otherwise(0))
            .cast("long").alias("n_follow"),
        )
    )


# ------------------------------------------------- recrawl scheduling

def recrawl_stats(
    history: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    digest_col: str = "content_md5",
) -> DataFrame:
    """Per-url change-rate statistics over a fetch history — the signal
    a recrawl scheduler ranks on (the Cho & Garcia-Molina freshness
    line of work: pages that changed between past fetches get short
    revisit intervals; static pages decay to long ones).

    Input: one row per (url, fetch), ``digest_col`` a content digest.
    Output one row per url with ≥2 fetches: (url, n_fetches,
    n_changes, change_ppm, span_us, mean_interval_us) — a change is a
    fetch whose digest differs from the previous fetch's;
    ``change_ppm`` = 10⁶·n_changes/(n_fetches−1). All integer exact
    (µs timestamps, floor division) so any SQL engine agrees
    bit-for-bit.

    Scale shape: ONE shuffle, keyed on url (the same key the fetch log
    is naturally bucketed by): a lag window then a groupBy on the same
    key — AQE collapses them onto one exchange. The output is
    url-cardinality, tiny next to the history. Reference analogue: the
    per-frame confidence history the engine's retry policy consults
    (src/core/ocr_engine.py:88-118) — past observations driving the
    next attempt's parameters.
    """
    w = Window.partitionBy(url_col).orderBy(F.col(ts_col))
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lagged = history.select(
        F.col(url_col).alias("url"),
        us.alias("_us"),
        F.col(digest_col).alias("_d"),
    ).select(
        "url",
        "_us",
        (
            F.lag("_d").over(
                Window.partitionBy("url").orderBy("_us")
            ).isNotNull()
            & (
                F.col("_d")
                != F.lag("_d").over(
                    Window.partitionBy("url").orderBy("_us")
                )
            )
        ).cast("int").alias("_chg"),
    )
    agg = lagged.groupBy("url").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum("_chg").cast("long").alias("n_changes"),
        (F.max("_us") - F.min("_us")).alias("span_us"),
    )
    return agg.where(F.col("n_fetches") >= 2).select(
        "url",
        "n_fetches",
        "n_changes",
        F.expr("n_changes * 1000000 div (n_fetches - 1)").alias("change_ppm"),
        "span_us",
        F.expr("span_us div (n_fetches - 1)").alias("mean_interval_us"),
    )


# --------------------------------------------- discovery completeness

def robots_sitemaps(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Extract ``Sitemap:`` directives from robots.txt bodies —
    (host, sitemap_url). Per the sitemaps protocol these live OUTSIDE
    any user-agent group (unlike Allow/Disallow), apply globally, and
    are the standard entry point of the discovery loop: robots.txt →
    sitemap urls → parse_sitemap → crawl_schedule. Case-insensitive
    directive, value used verbatim (it must be absolute per spec);
    blank values drop.

    Scale shape: one regexp_extract_all + explode over the (KB-scale)
    robots body — no shuffle, no window; complements ``parse_robots``
    without touching its group-resolution pass.
    """
    return (
        df.select(
            F.col(host_col).alias("host"),
            F.explode(
                F.regexp_extract_all(
                    F.col(robots_col),
                    F.lit(r"(?im)^[ \t]*sitemap:[ \t]*(\S+)[ \t]*$"),
                    1,
                )
            ).alias("sitemap_url"),
        )
        .where(F.col("sitemap_url") != "")
    )


PAGINATION_RE = {
    "next": r'(?is)<link[^>]*rel="next"[^>]*href="([^"]*)"',
    "prev": r'(?is)<link[^>]*rel="prev"[^>]*href="([^"]*)"',
}


def pagination_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """rel=next/prev pagination pointers per page: (url, next_url,
    prev_url, is_paginated) — first match wins, '' when absent. The
    crawl scheduler uses these to walk listing sequences in order
    instead of rediscovering them from sitemaps, and the dedup layer
    uses ``is_paginated`` to avoid near-dup-collapsing page 2..N of a
    series into page 1. Two codegen regexp projections, no shuffle.
    """
    h = F.col(html_col)
    nxt = F.regexp_extract(h, PAGINATION_RE["next"], 1)
    prv = F.regexp_extract(h, PAGINATION_RE["prev"], 1)
    return df.select(
        F.col(url_col).alias("url"),
        nxt.alias("next_url"),
        prv.alias("prev_url"),
        ((nxt != "") | (prv != "")).alias("is_paginated"),
    )


# ------------------------------------------------- frontier assembly

def build_frontier(
    candidates: DataFrame,
    rules: DataFrame,
    redirects: DataFrame | None = None,
    recrawl: DataFrame | None = None,
    per_host_cap: int = 50,
    default_ppm: int = 750_000,
    max_hops: int = 32,
) -> DataFrame:
    """Assemble the fetch frontier from discovered candidates — the
    composition the whole crawl-discovery layer exists for:

    1. resolve redirect/canonical pointers (``redirects``: (src, dst)
       edges through :func:`..redirects.resolve_redirects`; candidates
       landing in cycles/over-cap chains drop — nothing fetchable);
    2. robots longest-match filter on the FINAL url;
    3. dedup (channels overlap: a url found via sitemap AND feed is one
       fetch);
    4. priority = the url's recrawl ``change_ppm`` where history exists,
       else ``default_ppm`` — the exploration prior that sends new urls
       ahead of known-static ones but behind known-hot ones;
    5. per-host rank by (priority desc, url asc), capped — politeness.

    Input ``candidates``: (host, url). Output: (host, url, priority_ppm,
    fetch_rank ≤ cap). Scale shape: the redirect mapping and rule table
    are url-/host-keyed joins (rules broadcast); dedup + rank shuffle
    once on host — the frontier is fetch-list-sized, tiny next to the
    corpus that produced it.
    """
    from narowi_ocr_spark.operators.redirects import resolve_redirects

    cand = candidates.select(F.col("host"), F.col("url"))
    if redirects is not None:
        # ONE resolve pass, computed once: pointer-less urls pass
        # through, resolved pointers rewrite, cyclic/over-cap drop
        mapping = resolve_redirects(redirects, max_hops=max_hops)
        cand = (
            cand.join(mapping, cand["url"] == mapping["src"], "left")
            .where(F.col("src").isNull() | F.col("resolved"))
            .select("host", F.coalesce(F.col("final"), cand["url"])
                    .alias("url"))
        )
    allowed = robots_filter(cand.select("url"), rules).where(
        "fetch_allowed"
    )
    # politeness keys on the FINAL url's host (a redirect may cross
    # hosts; the fetch lands wherever the chain ends)
    fhost = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    dedup = (
        allowed.select(fhost.alias("host"), "url")
        .groupBy("host", "url")
        .agg(F.count("*").alias("_n"))
    )
    if recrawl is not None:
        pr = recrawl.select(F.col("url").alias("_ru"), "change_ppm")
        dedup = dedup.join(pr, dedup["url"] == F.col("_ru"), "left")
    else:
        dedup = dedup.withColumn("change_ppm", F.lit(None).cast("long"))
    prio = F.coalesce(F.col("change_ppm"), F.lit(default_ppm))
    return (
        dedup.select(
            "host", "url", prio.cast("long").alias("priority_ppm")
        )
        .withColumn(
            "fetch_rank",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.col("priority_ppm").desc(), F.col("url").asc()
                )
            ),
        )
        .where(F.col("fetch_rank") <= per_host_cap)
    )


# --------------------------------------------- url template mining

def url_template(u: Column) -> Column:
    """Generalize a URL path into its route template: numeric segments
    → ``{n}``, long hex segments (ids, hashes) → ``{hex}``, UUIDs →
    ``{uuid}``. 'https://s.example/item/8841?x=1' →
    's.example/item/{n}'. Query/fragment dropped (they rarely carry
    route identity and explode cardinality)."""
    hostpath = F.concat(
        url_host(u),
        F.when(url_path(u) == "", F.lit("/")).otherwise(url_path(u)),
    )
    # RE2-safe (no lookahead): segment-end is anchored by consuming the
    # next '/' and putting it back ($1), with a separate $-anchored pass
    uuid = (
        r"/[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}"
        r"-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}"
    )
    t = F.regexp_replace(hostpath, uuid + r"(/)", r"/{uuid}$1")
    t = F.regexp_replace(t, uuid + r"$", "/{uuid}")
    # two passes: the consumed '/' hides the second of two ADJACENT
    # numeric segments ('/3/44/') from a single left-to-right sweep
    for _ in range(2):
        t = F.regexp_replace(t, r"/\d+(/)", r"/{n}$1")
    t = F.regexp_replace(t, r"/\d+$", "/{n}")
    t = F.regexp_replace(t, r"/[0-9a-f]{16,}(/)", r"/{hex}$1")
    t = F.regexp_replace(t, r"/[0-9a-f]{16,}$", "/{hex}")
    return t


def url_templates(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Route-template census: (template, n_urls, example_url) for
    templates with ≥2 urls — the crawl-budget planner's table (a
    template with 10⁸ urls behind it is a faceted-search trap; one with
    10³ is a content section). One codegen projection + one
    partial-aggregated groupBy on the (low-cardinality) template key.
    """
    fp = df.select(
        url_template(F.col(url_col)).alias("template"),
        F.col(url_col).alias("url"),
    )
    return (
        fp.groupBy("template")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.min("url").alias("example_url"),
        )
        .where(F.col("n_urls") >= 2)
    )


def robots_crawl_delay(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Crawl-delay directives per host: (host, crawl_delay_ms) — the
    de-facto politeness knob (not in RFC 9309 but honored by most
    crawlers). First directive wins, fractional seconds supported,
    exact integer milliseconds; hosts without one are absent (the
    scheduler's default applies). One regexp projection, no shuffle."""
    raw = F.regexp_extract(
        F.col(robots_col),
        r"(?im)^[ \t]*crawl-delay:[ \t]*(\d+(?:\.\d+)?)[ \t]*$",
        1,
    )
    ip = F.split(raw, r"\.")
    # F.get is null-safe for the missing fractional part ('2' → ['2'])
    ms = (
        F.element_at(ip, 1).cast("long") * 1000
        + F.coalesce(
            F.substring(F.rpad(F.get(ip, 1), 3, "0"), 1, 3).cast("long"),
            F.lit(0),
        )
    )
    return (
        df.select(F.col(host_col).alias("host"), raw.alias("_r"), ms.alias("crawl_delay_ms"))
        .where(F.col("_r") != "")
        .drop("_r")
    )


# --------------------------------------------- spam / i18n signals

HIDDEN_STYLE_RE = (
    r'(?is)<(\w+)[^>]*style="[^"]*(?:display\s*:\s*none'
    r"|visibility\s*:\s*hidden)[^\"]*\"[^>]*>(.*?)</\1>"
)


def hidden_text_stats(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Hidden-text spam signal per page: (url, n_hidden_blocks,
    hidden_chars, visible_chars, hidden_ppm) — text inside
    display:none / visibility:hidden inline styles is what keyword
    stuffers show crawlers and hide from users; a high hidden share is
    a classic SEO-spam gate (and a boilerplate signal: cookie walls
    ship hidden too). Matching is tag-balanced per block (backreference
    \\1 pairs the close tag) over INLINE styles — class-based hiding
    needs the CSS, documented out of scope. hidden_ppm =
    10⁶·hidden/(hidden+visible) in exact integers; visible chars are
    the tag-stripped remainder after hidden blocks are removed.

    One regexp projection chain at the scan — no shuffle, no Python.
    Java regex only (backreferences are not RE2-safe), so the oracle
    derives expectations from the corpus formula instead of a regex.
    """
    h = F.col(html_col)
    hidden_texts = F.transform(
        F.regexp_extract_all(h, F.lit(HIDDEN_STYLE_RE), 2),
        lambda b: F.regexp_replace(b, "<[^>]*>", ""),
    )
    hidden_chars = F.aggregate(
        hidden_texts, F.lit(0), lambda acc, t: acc + F.length(t)
    ).cast("long")
    stripped_all = F.regexp_replace(
        F.regexp_replace(h, HIDDEN_STYLE_RE, ""), "<[^>]*>", ""
    )
    visible = F.length(stripped_all).cast("long")
    staged = df.select(
        F.col(url_col).alias("url"),
        F.size(hidden_texts).cast("int").alias("n_hidden_blocks"),
        hidden_chars.alias("hidden_chars"),
        visible.alias("visible_chars"),
    )
    return staged.select(
        "url",
        "n_hidden_blocks",
        "hidden_chars",
        "visible_chars",
        F.when(
            F.col("hidden_chars") + F.col("visible_chars") > 0,
            F.expr("hidden_chars * 1000000 div "
                   "(hidden_chars + visible_chars)"),
        ).otherwise(F.lit(0)).cast("long").alias("hidden_ppm"),
    )


HREFLANG_LINK_RE = r"(?is)(<link\s[^>]*>)"
HREFLANG_ATTR_RE = r'(?is)hreflang="([^"]*)"'
HREF_ATTR_RE = r'(?is)href="([^"]*)"'


def hreflang_alternates(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """hreflang alternate extraction: one row per
    <link rel=alternate hreflang=...> — (url, lang, alt_url). A page
    lists its own language variants, so these rows ARE the
    parallel-document alignment a multilingual corpus builder mines
    (the mC4/CCAligned signal) — group by the variant set or join
    pairs within a page for translation candidates. Entries missing
    either attribute drop.

    Block-scoped like every parser here: whole <link> tags are
    captured first, attributes extracted per block, so attribute order
    can never misalign. RE2-safe, no shuffle.
    """
    blk = F.col("_l")
    rows = df.select(
        F.col(url_col).alias("url"),
        F.explode(
            F.regexp_extract_all(F.col(html_col),
                                 F.lit(HREFLANG_LINK_RE), 1)
        ).alias("_l"),
    )
    lang = F.regexp_extract(blk, HREFLANG_ATTR_RE, 1)
    href = F.regexp_extract(blk, HREF_ATTR_RE, 1)
    return (
        rows.where(blk.rlike(r'(?is)rel="alternate"'))
        .select(
            "url",
            F.lower(lang).alias("lang"),
            href.alias("alt_url"),
        )
        .where((F.col("lang") != "") & (F.col("alt_url") != ""))
    )

"""DOM structure extraction: HTML tables → typed cell rows, heading
outlines → section records.

Why first-class: tables are the densest structured-fact payload a crawl
carries (the WebTables/TURL line of work trains directly on them), and
heading outlines drive section-aware chunking — both are extraction
products a training-data pipeline wants WITHOUT running full
main-content extraction. Reference analogue: the region-detect step
that hands the recognize loop a LIST of typed sub-regions per frame
(src/processing/image_processor.py:82-129) — here a page hands back a
list of typed table cells / headings.

Scope (documented subset, same spirit as the sitemap/feed parsers):
non-nested tables (an inner <table> truncates the outer at the first
</table> — lazy match), colspan/rowspan ignored (cells are indexed as
written), and cell/heading text is tag-stripped + trimmed but NOT
entity-unescaped (compose with functions/normalize for that).

Scale shape: each extractor is regexp_extract_all + chained posexplode
(Generate nodes) + codegen regex projections — no shuffle, no Python;
the html column is pruned at the scan when the caller selects only the
extracted columns. All patterns are RE2-safe (no lookaround, no
backrefs), so a SQL oracle can mirror them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
CELL_RE = r"(?is)(<t[dh][^>]*>.*?</t[dh]>)"
CELL_INNER_RE = r"(?is)^<t[dh][^>]*>(.*)</t[dh]>$"
HEADING_RE = r"(?is)(<h[1-6][^>]*>.*?</h[1-6]>)"
HEADING_INNER_RE = r"(?is)^<h[1-6][^>]*>(.*)</h[1-6]>$"


def _clean(col):
    return F.trim(F.regexp_replace(col, "<[^>]*>", ""))


def extract_tables(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Explode every <table> into one row per cell:
    (url, table_idx, row_idx, col_idx, is_header, cell) — all indexes
    0-based in document order; ``is_header`` marks <th> cells (the
    header/data distinction downstream schema inference keys on);
    ``cell`` is the tag-stripped trimmed inner text.

    Three chained posexplodes (tables → rows → cells) stay in one
    shuffle-free stage; fan-out is bounded by the page size cap
    upstream (P2), so no generated partition can balloon.
    """
    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(TABLE_RE), 1)
        ).alias("table_idx", "_tbl"),
    )
    rows = tables.select(
        "url",
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tbl"), F.lit(TR_RE), 1)
        ).alias("row_idx", "_tr"),
    )
    cells = rows.select(
        "url",
        "table_idx",
        "row_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tr"), F.lit(CELL_RE), 1)
        ).alias("col_idx", "_cell"),
    )
    return cells.select(
        "url",
        "table_idx",
        "row_idx",
        "col_idx",
        (F.lower(F.substring("_cell", 1, 3)) == "<th").alias("is_header"),
        _clean(F.regexp_extract(F.col("_cell"), CELL_INNER_RE, 1))
        .alias("cell"),
    )


def heading_outline(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Extract the h1-h6 outline: (url, pos, level, text) — ``pos`` is
    the 0-based document-order ordinal among headings, ``level`` the
    numeric tag level, ``text`` tag-stripped + trimmed. One
    posexplode + codegen projections; the chunker joins on url and
    segments at heading offsets.
    """
    h = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(HEADING_RE), 1)
        ).alias("pos", "_h"),
    )
    return h.select(
        "url",
        "pos",
        F.substring("_h", 3, 1).cast("int").alias("level"),
        _clean(F.regexp_extract(F.col("_h"), HEADING_INNER_RE, 1))
        .alias("text"),
    )


# ------------------------------------------------------------- PDF layout

PDF_LAYOUT_SCHEMA = (
    "url string, obj_idx int, line_idx int, "
    "x_milli long, y_milli long, text string"
)


def pdf_layout(
    df: DataFrame, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """Position-aware PDF line extraction (north-rule "layout parse"):
    one row per shown line with its text-matrix start position in exact
    milli-points, tracked through Td/TD/T*/TL/Tm
    (operators/pdftext.pdf_layout_lines). Stream order is whatever the
    writer emitted — compose with ``reading_order`` for visual order.

    Scale shape: one Arrow-batched stage (the same boundary budget as
    the extraction pipeline), payload consumed inside it; fan-out is
    lines-per-page, bounded by the upstream size cap. Reference
    analogue: the contour → (x, y, w, h) ROI list the recognize loop
    walks (src/processing/image_processor.py:100-129) — geometry
    attached to every recognized region.
    """
    from narowi_ocr_spark.operators.pdftext import pdf_layout_lines

    def gen(batches):
        for b in batches:
            rows = []
            for url, payload in zip(b[url_col], b[payload_col]):
                for (oi, li, x, y, t) in pdf_layout_lines(payload):
                    rows.append((url, oi, li, x, y, t))
            import pandas as pd

            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "obj_idx", "line_idx",
                    "x_milli", "y_milli", "text",
                ],
            )

    return df.select(url_col, payload_col).mapInPandas(
        gen, PDF_LAYOUT_SCHEMA
    )


def reading_order(lines: DataFrame) -> DataFrame:
    """Visual reading order over ``pdf_layout`` output: top-to-bottom
    (y desc — PDF origin is bottom-left), left-to-right (x asc),
    emission order as the deterministic tie-break. Adds ``rank``
    (1-based) per url. The window partitions on url — per-page
    cardinality, no global sort."""
    w = Window.partitionBy("url").orderBy(
        F.col("y_milli").desc(), F.col("x_milli").asc(),
        F.col("obj_idx").asc(), F.col("line_idx").asc(),
    )
    return lines.withColumn("rank", F.row_number().over(w))

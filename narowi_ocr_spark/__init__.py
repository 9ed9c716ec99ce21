"""narowi_ocr_spark — a PySpark-native web-text extraction engine.

A from-scratch re-expression of the capabilities of the reference repo
brody-armstrong/Narowi-OCR (region-detect → recognize → regex-parse for
medical-device readings) as a distributed main-content extraction pipeline
over Common-Crawl-style page tables:

  pages(url, warc_ts, html:binary, text, lang)
      → tokenize html into DOM blocks      (vectorized Arrow batches)
      → score + classify content blocks    (native Catalyst expressions)
      → assemble main text                 (higher-order array functions)
      → extract typed value spans          (pandas-UDF regex kernels)
      → per-url result rows + corpus metrics

Everything is DataFrame-first: Python executes only inside Arrow-batched
pandas UDFs (never per-row), all scoring/validation/aggregation stays
JVM-side for whole-stage codegen.
"""

__version__ = "0.1.0"

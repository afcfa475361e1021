"""Sources: parquet/Iceberg-style readers + deterministic synthetic
pages generation (Common-Crawl-style input per BASELINE.json
input_hint: url, warc_ts, html, text, lang)."""

"""Deterministic Common-Crawl-style ``pages`` table.

``BASELINE.json.input_hint`` fixes the input shape:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.
No such table ships in /root/testdata, so we DERIVE it
deterministically from the driver's ``documents`` table with pure
column arithmetic — the identical derivation is expressible in
DuckDB SQL, which is what makes the oracle comparison for the whole
pipeline possible (same inputs on both sides, independent engines).

Mix per ``doc_id % 20`` (mirrors FIXTURES.md §1: ~80% grok-parseable,
~15% fallback logfmt, ~5% unparseable):

- m in 0..15  -> apache-combined-style access line  (80%)
- m in 16..18 -> logfmt line ``ts=... level=... bytes=...`` (15%)
- m == 19     -> garbage prefix + raw document text (5%)

Host skew is explicit (north_rule: "partitioning / shuffle / skew
handled explicitly"): 40% of pages land on host0, 20% on host1, the
rest spread over 97 hosts — a zipf-ish head that exercises salting +
AQE skew handling at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

# -- shared scalar derivations (Spark Column side) --------------------


def derive_pages(documents: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    m = d % 20

    host_id = (
        F.when(d % 10 < 4, F.lit(0)).when(d % 10 < 6, F.lit(1)).otherwise(d % 97)
    )
    host = F.concat(F.lit("host"), host_id.cast("string"), F.lit(".example.com"))
    url = F.concat(
        F.lit("https://"), host, F.lit("/"), F.col("source"),
        F.lit("/item/"), (d % 1000).cast("string"), F.lit("?id="), d.cast("string"),
    )
    warc_ts = F.timestamp_seconds(F.lit(EPOCH_2024) + (d * 97) % 86400)

    client_ip = F.concat_ws(
        ".",
        ((d % 223) + 1).cast("string"), (d % 191).cast("string"),
        (d % 13).cast("string"), (d % 251).cast("string"),
    )
    user = F.concat(F.lit("u"), (d % 50).cast("string"))
    ts_str = F.concat(F.date_format(warc_ts, "dd/MMM/yyyy:HH:mm:ss"), F.lit(" +0000"))
    method = (
        F.when(d % 17 < 10, "GET").when(d % 17 < 13, "POST")
        .when(d % 17 < 15, "PUT").when(d % 17 < 16, "DELETE").otherwise("HEAD")
    )
    path = F.concat(F.lit("/"), F.col("source"), F.lit("/item/"), (d % 1000).cast("string"))
    status = (
        F.when(d % 23 < 14, 200).when(d % 23 < 16, 204).when(d % 23 < 18, 301)
        .when(d % 23 < 20, 404).when(d % 23 < 21, 403).when(d % 23 < 22, 500)
        .otherwise(503)
    )
    nbytes = F.col("n_chars") * 3 + d % 997

    apache_line = F.concat(
        client_ip, F.lit(" - "), user, F.lit(" ["), ts_str, F.lit('] "'),
        method, F.lit(" "), path, F.lit(' HTTP/1.1" '),
        status.cast("string"), F.lit(" "), nbytes.cast("string"),
    )
    level = (
        F.when(d % 7 < 3, "info").when(d % 7 < 5, "warn")
        .when(d % 7 < 6, "error").otherwise("debug")
    )
    logfmt_line = F.concat(
        F.lit("ts="), F.date_format(warc_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        F.lit(" level="), level,
        F.lit(" host="), host,
        F.lit(" bytes="), nbytes.cast("string"),
        F.lit(" msg=req_"), d.cast("string"),
    )
    garbage_line = F.concat(F.lit("\x01garbled "), F.substring(F.col("text"), 1, 40))

    text = (
        F.when(m < 16, apache_line).when(m < 19, logfmt_line).otherwise(garbage_line)
    )
    lang = (
        F.when(d % 37 == 0, F.lit("")).when(d % 41 == 0, F.lit("-"))
        .otherwise(F.col("lang"))
    )
    return documents.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        d.alias("doc_id"),  # retained as lineage key (dropped by sinks)
    )


# -- identical derivation in DuckDB SQL (oracle side) -----------------

def derive_pages_sql(documents_rel: str = "documents") -> str:
    """DuckDB SQL producing the SAME pages rows (minus html binary).

    Kept textually adjacent to ``derive_pages`` so the two stay in
    lock-step; every expression mirrors a Column above.
    """
    return f"""
    SELECT
      'https://host' || host_id || '.example.com/' || source || '/item/'
         || (doc_id % 1000) || '?id=' || doc_id AS url,
      warc_ts,
      CASE
        WHEN doc_id % 20 < 16 THEN
          ((doc_id % 223) + 1) || '.' || (doc_id % 191) || '.' || (doc_id % 13)
            || '.' || (doc_id % 251)
          || ' - u' || (doc_id % 50)
          || ' [' || strftime(warc_ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] "'
          || CASE WHEN doc_id % 17 < 10 THEN 'GET' WHEN doc_id % 17 < 13 THEN 'POST'
                  WHEN doc_id % 17 < 15 THEN 'PUT' WHEN doc_id % 17 < 16 THEN 'DELETE'
                  ELSE 'HEAD' END
          || ' /' || source || '/item/' || (doc_id % 1000) || ' HTTP/1.1" '
          || CASE WHEN doc_id % 23 < 14 THEN 200 WHEN doc_id % 23 < 16 THEN 204
                  WHEN doc_id % 23 < 18 THEN 301 WHEN doc_id % 23 < 20 THEN 404
                  WHEN doc_id % 23 < 21 THEN 403 WHEN doc_id % 23 < 22 THEN 500
                  ELSE 503 END
          || ' ' || (n_chars * 3 + doc_id % 997)
        WHEN doc_id % 20 < 19 THEN
          'ts=' || strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ')
          || ' level=' || CASE WHEN doc_id % 7 < 3 THEN 'info' WHEN doc_id % 7 < 5 THEN 'warn'
                               WHEN doc_id % 7 < 6 THEN 'error' ELSE 'debug' END
          || ' host=host' || host_id || '.example.com'
          || ' bytes=' || (n_chars * 3 + doc_id % 997)
          || ' msg=req_' || doc_id
        ELSE chr(1) || 'garbled ' || substr(text, 1, 40)
      END AS text,
      CASE WHEN doc_id % 37 = 0 THEN '' WHEN doc_id % 41 = 0 THEN '-'
           ELSE lang END AS lang,
      doc_id
    FROM (
      SELECT *,
        CASE WHEN doc_id % 10 < 4 THEN 0 WHEN doc_id % 10 < 6 THEN 1
             ELSE doc_id % 97 END AS host_id,
        TIMESTAMP '2024-01-01 00:00:00' + ((doc_id * 97) % 86400) * INTERVAL 1 SECOND
          AS warc_ts
      FROM {documents_rel}
    )
    """

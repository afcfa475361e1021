"""The flagship plan: web-access-log parse -> enrich -> route -> aggregate.

This is the north-star pipeline (BASELINE.json.north_rule) built
Spark-first:

- parse   : grok (compiled once, driver-side -> JVM regexp_extract,
            zero Python) with a logfmt fallback — first-match-wins,
            VRL if/else chain semantics; un-parseable rows carry an
            ``error`` column instead of throwing (fallibility-as-data,
            reference src/compiler/expression/assignment.rs:531-548).
- enrich  : broadcast hash join against a small lang lookup table
            (VRL enrichment-table semantics: first-match key equality,
            miss -> nulls).
- route   : one ``F.when`` cascade -> ``route`` column (VRL route/abort
            as filter + multi-sink: reference src/test/mod.rs:268-277
            abort semantics), then a SINGLE pass partitioned write.
- aggregate: tumbling 1h windows on warc_ts per route
            (F.window/date_trunc — map-side partial agg native).

Scale notes (100 TB design point):
- The parse stage is pure column expressions -> whole-stage codegen;
  no shuffle until the aggregate.
- The enrichment join is broadcast (30-row dim) — no shuffle.
- The only shuffle is the final groupBy(route, hour): ~routes x 24
  groups/day, trivially small after map-side partial aggregation.
- Host skew (40% of rows on one host) never becomes a shuffle key
  here; sinks partition by route. Where host IS a key (per-host
  rollups), use vrl_spark.operators.skew salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vrl_spark.grok import compile_grok
from vrl_spark.sources.pages import derive_pages, derive_pages_sql
from vrl_spark.sources import read_table

ACCESS_PATTERN = (
    '%{IPV4:client_ip} - %{USER:user} \\[%{HTTPDATE:ts}\\] '
    '"%{WORD:method} %{URIPATH:path} HTTP/%{NUMBER:http_version}" '
    '%{NONNEGINT:status} %{NONNEGINT:bytes}'
)
ACCESS = compile_grok(ACCESS_PATTERN)

# logfmt fallback fields extracted by regex (same regexes run in the
# DuckDB oracle — single definition here).
LOGFMT_FIELDS = {
    "level": r"(?:^|\s)level=(\w+)",
    "log_bytes": r"(?:^|\s)bytes=(\d+)",
    "log_ts": r"(?:^|\s)ts=(\S+)",
}

# engine-side fast path: the generator's fixed-order logfmt line as a
# single anchored grok pattern (one regex pass; the oracle keeps the
# order-independent per-key extraction — same values, independent path)
LOGFMT_PATTERN = (
    "ts=%{NOTSPACE:log_ts} level=%{WORD:level} host=%{NOTSPACE:log_host} "
    "bytes=%{NONNEGINT:log_bytes} msg=%{NOTSPACE:msg}"
)
LOGFMT = compile_grok(LOGFMT_PATTERN)

# Enrichment dim — single source of truth for Spark AND the oracle.
LANG_ROWS = [
    ("en", "English", "germanic"), ("de", "German", "germanic"),
    ("nl", "Dutch", "germanic"), ("sv", "Swedish", "germanic"),
    ("es", "Spanish", "romance"), ("fr", "French", "romance"),
    ("it", "Italian", "romance"), ("pt", "Portuguese", "romance"),
    ("ru", "Russian", "slavic"), ("pl", "Polish", "slavic"),
    ("zh", "Chinese", "sinitic"), ("ja", "Japanese", "japonic"),
    ("ko", "Korean", "koreanic"), ("ar", "Arabic", "semitic"),
    ("und", "Unknown", "unknown"),
]


def load_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return derive_pages(docs)


# ---------------------------------------------------------------------
# Stages (Spark side)
# ---------------------------------------------------------------------

def parse_stage(pages: DataFrame) -> DataFrame:
    """Grok-parse ``text`` with logfmt fallback; errors become data.

    One-pass lowering: ONE anchored regex execution per row for the
    primary pattern; only rows it rejects pay a second pass for the
    fallback (regex work per row is 1 + miss_rate instead of
    fields + 2 — the parse stage is the pipeline's hot loop)."""
    from vrl_spark.functions.parse import onepass_stage

    txt = F.col("text")
    # onepass_stage = Generate-barrier extraction: each regex runs ONCE
    # per row no matter how many fields are projected below (a bare
    # Column one-pass embeds the regex once per field). The fallback's
    # input is gated to NULL on primary-hit rows, so its regex
    # short-circuits: total regex work = 1 + miss_rate per row.
    step1 = onepass_stage(pages, "_ap", txt, ACCESS, anchored=True)
    step2 = onepass_stage(
        step1, "_lf", F.when(F.col("_ap").isNull(), txt), LOGFMT, anchored=True
    )
    ap, lf = F.col("_ap"), F.col("_lf")
    matched, logfmt_hit = ap.isNotNull(), lf.isNotNull()
    df = step2.select(
        "*",
        matched.alias("_grok_ok"),
        logfmt_hit.alias("_logfmt_ok"),
        *[ap.getField(n).alias(n) for n in ACCESS.fields],
        *[lf.getField(n).alias(n) for n in ("level", "log_bytes", "log_ts")],
    )
    # coercions with VRL semantics: status/bytes strings -> long.
    # (captures are all strings pre-coercion, parse_regex.rs:83-86)
    return df.select(
        "*",
        F.col("status").try_cast("long").alias("status_int"),
        F.coalesce(
            F.col("bytes").try_cast("long"), F.col("log_bytes").try_cast("long")
        ).alias("bytes_int"),
        F.when(~matched & ~logfmt_hit, F.lit("unable to parse input with grok pattern"))
        .alias("error"),
        F.substring_index(F.substring_index(F.col("url"), "/", 3), "/", -1).alias(
            "url_host"
        ),
    ).drop("_ap", "_lf")


def enrich_stage(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Broadcast-join the lang dim. Nullish lang ('', '-', null) is
    normalized to 'und' first (is_nullish semantics,
    reference src/stdlib/is_nullish.rs)."""
    dim = spark.createDataFrame(LANG_ROWS, ["lang_key", "lang_name", "lang_family"])
    norm = F.when(
        F.col("lang").isNull() | F.trim(F.col("lang")).isin("", "-"), F.lit("und")
    ).otherwise(F.col("lang"))
    return (
        df.withColumn("lang_norm", norm)
        .join(F.broadcast(dim), F.col("lang_norm") == F.col("lang_key"), "left")
        .drop("lang_key")
    )


def route_stage(df: DataFrame) -> DataFrame:
    """First-match-wins when-cascade (VRL if/else chain -> Return
    semantics, reference src/compiler/expression/return.rs:42-48)."""
    status = F.col("status_int")
    route = (
        F.when(F.col("error").isNotNull(), "dead_letter")
        .when(F.col("_grok_ok") & (status >= 500), "server_error")
        .when(F.col("_grok_ok") & (status >= 400), "client_error")
        .when(F.col("_grok_ok") & F.col("method").isin("POST", "PUT", "DELETE"), "writes")
        .when(F.col("_grok_ok"), "ok")
        .when(F.col("level").isin("error", "fatal"), "server_error")
        .otherwise("app_logs")
    )
    return df.withColumn("route", route)


def aggregate_stage(df: DataFrame) -> DataFrame:
    """Per-route tumbling 1h windows keyed by warc_ts."""
    return (
        df.groupBy(
            F.col("route"), F.date_trunc("hour", F.col("warc_ts")).alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("page_count"),
            F.sum(F.coalesce(F.col("bytes_int"), F.lit(0))).alias("total_bytes"),
            F.countDistinct(F.col("url_host")).alias("distinct_hosts"),
            F.countDistinct(F.col("lang_family")).alias("distinct_families"),
        )
    )


def full_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_pages(spark, sf_dir)
    df = parse_stage(df)
    df = enrich_stage(spark, df)
    df = route_stage(df)
    return aggregate_stage(df)


def routed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-aggregate routed rows (for routed-row equality checks and
    the multi-sink write)."""
    df = load_pages(spark, sf_dir)
    df = parse_stage(df)
    df = enrich_stage(spark, df)
    df = route_stage(df)
    return df.select(
        "doc_id", "url", "route", "status_int", "bytes_int",
        "method", "client_ip", "level", "lang_norm", "lang_family", "error",
    )


def write_sinks(df: DataFrame, out_dir: str) -> None:
    """Single-pass fan-out: one job, partitioned by route.

    At scale this is the one-write equivalent of Vector's multi-sink
    fan-out — each route lands in its own partition directory
    (Iceberg: PARTITIONED BY route), no per-sink re-scan."""
    df.write.mode("overwrite").partitionBy("route").parquet(out_dir)


# ---------------------------------------------------------------------
# Oracle SQL (DuckDB dialect) — independent re-implementation
# ---------------------------------------------------------------------

def _lang_values_sql() -> str:
    rows = ", ".join(f"('{k}', '{n}', '{f}')" for k, n, f in LANG_ROWS)
    return f"(VALUES {rows}) AS d(lang_key, lang_name, lang_family)"


def parsed_cte_sql() -> str:
    """CTE chain reproducing parse+enrich+route over the same derived
    pages, in DuckDB SQL. Group indices match ``ACCESS.group_index``."""
    g = ACCESS.group_index
    rx = ACCESS.regex.replace("'", "''")
    lvl = LOGFMT_FIELDS["level"].replace("'", "''")
    lby = LOGFMT_FIELDS["log_bytes"].replace("'", "''")
    return f"""
    WITH pages AS ({derive_pages_sql()}),
    parsed AS (
      SELECT *,
        regexp_matches(text, '{rx}') AS grok_ok,
        NOT regexp_matches(text, '{rx}')
          AND regexp_matches(text, '{lvl}') AS logfmt_ok,
        regexp_extract(text, '{rx}', {g('method')}) AS method,
        regexp_extract(text, '{rx}', {g('status')}) AS status,
        regexp_extract(text, '{rx}', {g('bytes')}) AS bytes,
        regexp_extract(text, '{lvl}', 1) AS level,
        regexp_extract(text, '{lby}', 1) AS log_bytes,
        regexp_extract(url, '^https://([^/]+)/', 1) AS url_host
      FROM pages
    ),
    coerced AS (
      SELECT *,
        CASE WHEN grok_ok THEN TRY_CAST(status AS BIGINT) END AS status_int,
        CASE WHEN grok_ok THEN TRY_CAST(bytes AS BIGINT)
             WHEN logfmt_ok THEN TRY_CAST(log_bytes AS BIGINT) END AS bytes_int,
        CASE WHEN NOT grok_ok AND NOT logfmt_ok
             THEN 'unable to parse input with grok pattern' END AS error
      FROM parsed
    ),
    enriched AS (
      SELECT c.*, d.lang_name, d.lang_family,
        CASE WHEN c.lang IS NULL OR trim(c.lang) IN ('', '-') THEN 'und'
             ELSE c.lang END AS lang_norm
      FROM coerced c
      LEFT JOIN {_lang_values_sql()}
        ON (CASE WHEN c.lang IS NULL OR trim(c.lang) IN ('', '-') THEN 'und'
                 ELSE c.lang END) = lang_key
    ),
    routed AS (
      SELECT *,
        CASE
          WHEN error IS NOT NULL THEN 'dead_letter'
          WHEN grok_ok AND status_int >= 500 THEN 'server_error'
          WHEN grok_ok AND status_int >= 400 THEN 'client_error'
          WHEN grok_ok AND method IN ('POST','PUT','DELETE') THEN 'writes'
          WHEN grok_ok THEN 'ok'
          WHEN level IN ('error','fatal') THEN 'server_error'
          ELSE 'app_logs'
        END AS route
      FROM enriched
    )
    """


def aggregate_oracle_sql() -> str:
    return parsed_cte_sql() + """
    SELECT route, date_trunc('hour', warc_ts) AS hour,
      COUNT(*) AS page_count,
      CAST(SUM(COALESCE(bytes_int, 0)) AS BIGINT) AS total_bytes,
      COUNT(DISTINCT url_host) AS distinct_hosts,
      COUNT(DISTINCT lang_family) AS distinct_families
    FROM routed
    GROUP BY route, hour
    """


def routed_oracle_sql() -> str:
    return parsed_cte_sql() + """
    SELECT doc_id, url, route, status_int, bytes_int,
      CASE WHEN grok_ok THEN method END AS method,
      CASE WHEN grok_ok THEN regexp_extract(text,
        '""" + ACCESS.regex.replace("'", "''") + f"""', {ACCESS.group_index('client_ip')}) END AS client_ip,
      CASE WHEN logfmt_ok THEN level END AS level,
      lang_norm, lang_family, error
    FROM routed
    """

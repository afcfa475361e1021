"""Ported VRL coercion test vectors (reference test_function! macros in
src/stdlib/to_int.rs, to_float.rs, to_bool.rs, to_string.rs,
is_nullish.rs) executed through the Spark lowering.

All cases for one function run in ONE DataFrame pass (a single
column per case) to keep the suite fast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vrl_spark.functions import coerce


def run_cases(spark, cases, builder):
    """cases: list of (input_value, spark_dtype, expected)."""
    exprs = []
    for i, (val, dtype, _want) in enumerate(cases):
        col = F.lit(val).cast(dtype) if val is not None else F.lit(None).cast(dtype)
        exprs.append(builder(col, dtype).alias(f"c{i}"))
    row = spark.range(1).select(*exprs).collect()[0]
    for i, (val, dtype, want) in enumerate(cases):
        got = row[f"c{i}"]
        assert got == want or (got is None and want is None), (
            f"case {i}: {builder.__name__}({val!r}:{dtype}) -> {got!r}, want {want!r}"
        )


S, L, D, B, TS, N = (
    T.StringType(), T.LongType(), T.DoubleType(), T.BooleanType(),
    T.TimestampType(), T.NullType(),
)


def test_to_int(spark):
    # reference src/stdlib/to_int.rs:4-19 + test vectors
    run_cases(spark, [
        ("123", S, 123),
        ("  42 ", S, None),        # Rust str::parse rejects padding
        ("-7", S, -7),
        ("1.5", S, None),          # float-string errors in VRL
        ("abc", S, None),          # error
        (None, S, 0),              # null -> 0 (!)
        (5, L, 5),
        (2.9, D, 2),               # truncates toward zero
        (-2.9, D, -2),
        (True, B, 1),
        (False, B, 0),
        (float("nan"), D, None),   # NaN unrepresentable -> error
    ], coerce.to_int)


def test_to_float(spark):
    run_cases(spark, [
        ("1.5", S, 1.5),
        ("10", S, 10.0),
        ("2e3", S, 2000.0),
        ("x", S, None),
        (None, S, 0.0),            # null -> 0.0
        (True, B, 1.0),
        (7, L, 7.0),
        (float("nan"), D, None),
    ], coerce.to_float)


def test_to_bool(spark):
    # conversion table src/compiler/conversion/mod.rs:150+
    run_cases(spark, [
        ("true", S, True), ("t", S, True), ("yes", S, True), ("y", S, True),
        ("false", S, False), ("f", S, False), ("no", S, False), ("n", S, False),
        ("0", S, False), ("17", S, True), ("TRUE", S, True),
        ("banana", S, None),       # error
        (None, S, False),          # null -> false
        (0, L, False), (1, L, True), (-3, L, True),
        (0.0, D, False), (0.1, D, True),
        (True, B, True),
    ], coerce.to_bool)


def test_to_string(spark):
    run_cases(spark, [
        ("hi", S, "hi"),
        (None, S, ""),             # null -> ""
        (True, B, "true"), (False, B, "false"),
        (52, L, "52"),
        (52.0, D, "52"),           # ryu prints trailing .0 as bare int
        (52.5, D, "52.5"),
    ], coerce.to_string)


def test_to_string_timestamp_rfc3339(spark):
    row = spark.sql(
        "SELECT timestamp'2021-01-02 03:04:05' AS a, "
        "timestamp'2021-01-02 03:04:05.123456' AS b"
    ).select(
        coerce.to_string(F.col("a"), TS).alias("a"),
        coerce.to_string(F.col("b"), TS).alias("b"),
    ).collect()[0]
    assert row["a"] == "2021-01-02T03:04:05Z"
    assert row["b"] == "2021-01-02T03:04:05.123456Z"


def test_is_nullish(spark):
    # src/stdlib/is_nullish.rs: null, "", "-", whitespace-only
    row = spark.range(1).select(
        coerce.is_nullish(F.lit(None).cast("string")).alias("a"),
        coerce.is_nullish(F.lit("")).alias("b"),
        coerce.is_nullish(F.lit("-")).alias("c"),
        coerce.is_nullish(F.lit("   ")).alias("d"),
        coerce.is_nullish(F.lit("x")).alias("e"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"], row["d"], row["e"]) == (
        True, True, True, True, False)


def test_is_ipv4(spark):
    row = spark.range(1).select(
        coerce.is_ipv4(F.lit("10.1.2.3")).alias("a"),
        coerce.is_ipv4(F.lit("999.1.2.3")).alias("b"),
        coerce.is_ipv4(F.lit("not an ip")).alias("c"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (True, False, False)


def test_is_nullish_unicode_whitespace_and_strict_parse(spark):
    """ADVICE round-2: '\n  \n' is nullish (Unicode White_Space), and
    to_bool(' true') errors like Rust parse_bool (no trimming)."""
    row = spark.range(1).select(
        coerce.is_nullish(F.lit("\n  \n")).alias("nl"),
        coerce.is_nullish(F.lit("\t")).alias("tab"),
        coerce.is_nullish(F.lit(" ")).alias("thin_space"),
        coerce.to_bool(F.lit(" true"), T.StringType()).alias("padded_bool"),
        coerce.to_float(F.lit(" 1.5 "), T.StringType()).alias("padded_float"),
    ).collect()[0]
    assert row["nl"] is True
    assert row["tab"] is True
    assert row["thin_space"] is True
    assert row["padded_bool"] is None
    assert row["padded_float"] is None


def test_to_regex_plan_time_vectors(spark):
    """Reference test_function! vectors (src/stdlib/to_regex.rs:98-113):
    a valid pattern round-trips; '(+)' errors with the reference's
    'could not create regex' prefix — surfaced at PLAN time per the
    regexes-are-plan-time-constants doctrine."""
    import pytest

    assert coerce.to_regex("^test[A-Za-z_]+$") == "^test[A-Za-z_]+$"
    with pytest.raises(ValueError, match="could not create regex"):
        coerce.to_regex("(+)")
    # the validated pattern feeds the native JVM match path
    row = spark.range(1).select(
        F.lit("testWord").rlike(coerce.to_regex("^test[A-Za-z_]+$")).alias("m")
    ).collect()[0]
    assert row["m"] is True


def test_to_regex_dynamic_and_rlike_dynamic(spark):
    """Dynamic lane: per-row pattern columns, fallibility-as-data —
    invalid patterns become error values (reference semantics), never
    job failures (Spark's rlike(col, col) would throw)."""
    df = spark.createDataFrame(
        [
            (1, "testWord", "^test[A-Za-z_]+$"),   # valid, matches
            (2, "other", "^test[A-Za-z_]+$"),      # valid, no match
            (3, "anything", "(+)"),                 # invalid pattern
            (4, None, "^a"),                        # NULL value
            (5, "x", None),                         # NULL pattern
        ],
        "id long, val string, pat string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            coerce.to_regex_dynamic(F.col("pat")).alias("rx"),
            coerce.rlike_dynamic(F.col("val"), F.col("pat")).alias("m"),
        ).collect()
    }
    assert out[1]["rx"]["regex"] == "^test[A-Za-z_]+$"
    assert out[1]["rx"]["error"] is None
    assert out[1]["m"]["matched"] is True
    assert out[2]["m"]["matched"] is False
    # invalid: error populated on both lanes, match NULL
    assert out[3]["rx"]["regex"] is None
    assert "could not create regex" in out[3]["rx"]["error"]
    assert out[3]["m"]["matched"] is None
    assert "could not create regex" in out[3]["m"]["error"]
    # NULL value with a valid pattern: no match, no error
    assert out[4]["m"]["matched"] is None and out[4]["m"]["error"] is None
    # NULL pattern is an error, matching the null-coercion family
    assert "pattern is null" in out[5]["rx"]["error"]
    assert "pattern is null" in out[5]["m"]["error"]

"""VRL coercion semantics as Column builders.

These replicate the EXACT cascades from the reference — which differ
from Spark's cast defaults on every interesting point:

- ``to_int``   (reference src/stdlib/to_int.rs:4-19): float truncates,
  bool -> 1/0, **null -> 0** (Spark cast keeps null!), string parsed,
  timestamp -> epoch seconds, otherwise error.
- ``to_float`` (src/stdlib/to_float.rs:11-28): bool -> 1.0/0.0,
  null -> 0.0, timestamp -> epoch seconds with fractional nanos.
- ``to_bool``  (src/stdlib/to_bool.rs:4-17 + conversion table
  src/compiler/conversion/mod.rs:150+): numbers != 0, null -> false,
  strings via the table: true/t/yes/y + nonzero-int-string -> true,
  false/f/no/n/0 -> false, anything else errors.
- ``to_string`` (src/stdlib/to_string.rs:3-16): timestamp -> RFC3339,
  **null -> ""**, collections error.

"Error" in the relational encoding means the value column is NULL
and (when the caller asked for it) an error-message column is set —
rows never throw (fallibility-as-data, SURVEY §2.1).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Strings the reference's Conversion::Boolean accepts
# (src/compiler/conversion/mod.rs: parse_bool behavior).
_TRUE_STRINGS = ["true", "t", "yes", "y"]
_FALSE_STRINGS = ["false", "f", "no", "n", "0"]

# No whitespace tolerance: the reference parses with Rust
# `str::parse` / `parse_bool`, which reject padded strings like
# " 42 " (compiler/conversion/mod.rs:204-222).
_INT_RE = r"^[+-]?\d+$"
_FLOAT_RE = r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"


def to_int(col: Column, dtype: T.DataType) -> Column:
    """VRL ``to_int`` for a column of Spark type ``dtype`` -> LongType.

    Unlike VRL (dynamic), the input type is statically known, so the
    cascade specializes at plan build — the same trick as VRL's
    compile-time type narrowing (src/compiler/type_def.rs).
    Strings that don't parse yield NULL (error branch).
    """
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        out = col.cast("long")
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        # Rust `as i64` truncates toward zero; Spark double->long cast
        # also truncates. NaN -> error (NULL) per NotNan semantics.
        out = F.when(F.isnan(col), F.lit(None)).otherwise(col.cast("long"))
    elif isinstance(dtype, T.BooleanType):
        out = F.when(col, F.lit(1)).otherwise(F.lit(0)).cast("long")
    elif isinstance(dtype, T.TimestampType):
        out = F.unix_timestamp(col)
    elif isinstance(dtype, T.StringType):
        # whole-string int parse; float-looking strings error in VRL
        out = F.when(col.rlike(_INT_RE), col.cast("long"))
    elif isinstance(dtype, T.NullType):
        out = F.lit(0).cast("long")
    else:
        raise TypeError(f"to_int: unsupported input type {dtype}")
    # null input -> 0 (to_int.rs:4-19 Null => 0)
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(out).alias("to_int")


def to_float(col: Column, dtype: T.DataType) -> Column:
    """VRL ``to_float`` -> DoubleType. null -> 0.0; NaN errors."""
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        out = F.when(F.isnan(col), F.lit(None)).otherwise(col.cast("double"))
    elif isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        out = col.cast("double")
    elif isinstance(dtype, T.BooleanType):
        out = F.when(col, F.lit(1.0)).otherwise(F.lit(0.0))
    elif isinstance(dtype, T.TimestampType):
        # epoch seconds with sub-second fraction (to_float.rs:19-24)
        out = col.cast("double")
    elif isinstance(dtype, T.StringType):
        out = F.when(col.rlike(_FLOAT_RE), col.cast("double"))
    elif isinstance(dtype, T.NullType):
        out = F.lit(0.0)
    else:
        raise TypeError(f"to_float: unsupported input type {dtype}")
    return F.when(col.isNull(), F.lit(0.0)).otherwise(out).alias("to_float")


def to_bool(col: Column, dtype: T.DataType) -> Column:
    """VRL ``to_bool`` -> BooleanType. null -> false; bad string errors."""
    if isinstance(dtype, T.BooleanType):
        out = col
    elif isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        out = col != 0
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        out = F.when(F.isnan(col), F.lit(None)).otherwise(col != 0.0)
    elif isinstance(dtype, T.StringType):
        # parse_bool (conversion/mod.rs:204-222): exact words (any
        # case), else integer parse — no whitespace trimming
        lowered = F.lower(col)
        out = (
            F.when(lowered.isin(_TRUE_STRINGS), F.lit(True))
            .when(lowered.isin(_FALSE_STRINGS), F.lit(False))
            # int-string: nonzero -> true, zero -> false (conversion table)
            .when(col.rlike(_INT_RE), col.cast("long") != 0)
        )
    elif isinstance(dtype, T.NullType):
        out = F.lit(False)
    else:
        raise TypeError(f"to_bool: unsupported input type {dtype}")
    return F.when(col.isNull(), F.lit(False)).otherwise(out).alias("to_bool")


def to_string(col: Column, dtype: T.DataType) -> Column:
    """VRL ``to_string`` -> StringType. null -> ''; timestamp RFC3339."""
    if isinstance(dtype, T.StringType):
        out = col
    elif isinstance(dtype, T.BooleanType):
        out = F.when(col, "true").otherwise("false")
    elif isinstance(dtype, T.TimestampType):
        out = rfc3339(col)
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        # Rust ryu prints 1.0 as "1", 1.5 as "1.5"; Spark cast prints
        # "1.0"/"1.5". Normalize trailing ".0" to match.
        out = F.regexp_replace(col.cast("string"), r"\.0$", "")
    elif isinstance(dtype, T.NullType):
        out = F.lit("")
    else:
        out = col.cast("string")
    return F.when(col.isNull(), F.lit("")).otherwise(out).alias("to_string")


def rfc3339(ts: Column) -> Column:
    """RFC3339 w/ 'AutoSi' precision like the reference's renderer
    (src/value/value.rs:219-221): second precision when no sub-second
    part, otherwise full precision. We emit micros when present."""
    whole = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    frac = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    has_frac = F.unix_micros(ts) % 1_000_000 != 0
    return F.when(has_frac, frac).otherwise(whole)


# --- type predicates (reference src/stdlib/is_*.rs) ------------------

def is_nullish(col: Column) -> Column:
    """null, "", "-", or whitespace-only (src/stdlib/is_nullish.rs;
    whitespace = the full Unicode White_Space property, hence the
    Java (?U) regex flag — F.trim only strips ASCII spaces and would
    miss tab/newline-only strings)."""
    return col.isNull() | (col == "-") | col.rlike(r"^(?U)\s*$")


_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)$"
)


def is_ipv4(col: Column) -> Column:
    return col.rlike(_IPV4_RE)


def is_json(col: Column) -> Column:
    """Parseable as JSON (src/stdlib/is_json.rs)."""
    return F.try_parse_json(col).isNotNull()


def is_empty(col: Column, dtype: T.DataType) -> Column:
    """'' / [] / {} (src/stdlib/is_empty.rs)."""
    if isinstance(dtype, T.StringType):
        return F.length(col) == 0
    if isinstance(dtype, (T.ArrayType, T.MapType)):
        return F.size(col) == 0
    raise TypeError(f"is_empty: unsupported type {dtype}")


def to_regex(pattern: str) -> str:
    """VRL ``to_regex`` (reference src/stdlib/to_regex.rs:4-10,
    registered src/stdlib/mod.rs:435), plan-time lane.

    The engine's doctrine (SURVEY §1.1) keeps regexes PLAN-TIME
    CONSTANTS — compiled once here, matched JVM-side by rlike /
    regexp_extract — so the runtime coercion collapses to validation:
    an invalid pattern raises ``ValueError("could not create regex:
    ...")`` at plan build (the reference returns the same message as
    an error value; with a literal argument that error is knowable
    before any row flows). Returns the pattern unchanged for
    composition into the parse/match builders.

    Validation uses Python ``re`` — the shared Java/RE2/Python syntax
    subset the repo standardizes on (``operators/pii.py`` doctrine);
    patterns outside the subset are rejected by the JVM at run time
    instead, which is the same fail-loudly outcome one stage later.
    The reference's own notice applies: compiling regexes per event is
    expensive — that is what :func:`to_regex_dynamic` is for, and why
    it is the slow lane."""
    import re

    try:
        re.compile(pattern)
    except re.error as err:
        raise ValueError(f"could not create regex: {err}") from None
    return pattern


def to_regex_dynamic(pattern: Column) -> Column:
    """Dynamic-lane ``to_regex``: per-row pattern validation for a
    pattern COLUMN, fallibility-as-data (struct<regex, error> — the
    repo's error-column convention; exactly one side is non-NULL).

    Arrow-batched with per-batch memoization of distinct patterns
    (dynamic regex compilation is the reference's documented
    throughput hazard — to_regex.rs's compile() warns on every use;
    here the cost is one compile per DISTINCT pattern per batch).
    Pair with :func:`rlike_dynamic` for matching, or pass validated
    patterns to ``F.rlike(value, pattern)`` for the JVM path when the
    producer is trusted."""
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<regex: string, error: string>")
    def _v(s: pd.Series) -> pd.DataFrame:
        cache: dict[str, str | None] = {}

        def one(p):
            if p is None:
                return (None, "could not create regex: pattern is null")
            if p not in cache:
                try:
                    re.compile(p)
                    cache[p] = None
                except re.error as err:
                    cache[p] = f"could not create regex: {err}"
            e = cache[p]
            return (None, e) if e is not None else (p, None)

        out = [one(p) for p in s]
        return pd.DataFrame(out, columns=["regex", "error"])

    return _v(pattern)


def rlike_dynamic(value: Column, pattern: Column) -> Column:
    """``value =~ to_regex(pattern_col)``: match against a PER-ROW
    pattern with the reference's error semantics — returns
    struct<matched boolean, error string> where an invalid pattern
    yields (NULL, message) instead of failing the job (Spark's own
    ``rlike(col, col)`` throws on the first bad pattern).

    Un-anchored substring search (``re.search``) like rlike /
    ``Regex::is_match`` — but executed by PYTHON ``re``, not the JVM:
    patterns must stay in the repo's shared Java/Python syntax subset
    (``operators/pii.py`` doctrine) for lane portability. Outside it
    the lanes diverge — Python's ``\\d``/``\\w``/``\\s`` match Unicode
    where Java's are ASCII-only, and Java-only syntax (possessive
    quantifiers, ``\\h``) is an error value here but matches on the
    JVM lane. Arrow-batched, one compile per distinct pattern per
    batch — the documented slow lane; plan-time patterns should use
    :func:`to_regex` + native rlike."""
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<matched: boolean, error: string>")
    def _m(v: pd.Series, p: pd.Series) -> pd.DataFrame:
        cache: dict[str, object] = {}

        def one(val, pat):
            if pat is None:
                return (None, "could not create regex: pattern is null")
            got = cache.get(pat, False)
            if got is False:
                try:
                    got = re.compile(pat)
                except re.error as err:
                    got = f"could not create regex: {err}"
                cache[pat] = got
            if isinstance(got, str):
                return (None, got)
            if val is None:
                return (None, None)
            return (got.search(val) is not None, None)

        out = [one(val, pat) for val, pat in zip(v, p)]
        return pd.DataFrame(out, columns=["matched", "error"])

    return _m(value, pattern)

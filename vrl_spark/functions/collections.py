"""Object/array collection functions (reference src/stdlib/).

Closure functions (map_keys/map_values/filter/for_each — VRL's only
higher-order constructs, src/compiler/function/closure.rs:19-56)
lower to Spark SQL lambda functions: transform_keys,
transform_values, filter — staying fully JVM-side."""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- objects (MapType) -----------------------------------------------


def merge(a: Column, b: Column) -> Column:
    """Shallow merge, right wins (src/stdlib/merge.rs + `|=` op).
    map_concat in Spark 3.4+ keeps the LAST occurrence per key under
    spark.sql.mapKeyDedupPolicy=LAST_WIN; we implement right-wins
    explicitly to be config-independent."""
    only_a = F.map_filter(a, lambda k, _: ~F.map_contains_key(b, k))
    return F.map_concat(only_a, b)


def compact_map(col: Column) -> Column:
    """Drop null/empty-string values (src/stdlib/compact.rs, map case)."""
    return F.map_filter(col, lambda _, v: v.isNotNull() & (v != ""))


def compact_array(col: Column) -> Column:
    """src/stdlib/compact.rs, array case."""
    return F.filter(col, lambda v: v.isNotNull() & (v != ""))


def exists(col: Column, key: str) -> Column:
    """Path existence on a map column (src/stdlib/exists.rs)."""
    return F.map_contains_key(col, key)


def get(col: Column, key: Column | str) -> Column:
    """Dynamic-path get on a map column (src/stdlib/get.rs:44)."""
    return F.element_at(col, key) if isinstance(key, Column) else col.getItem(key)


def set_(col: Column, key: str, value: Column) -> Column:
    """Dynamic-path set (src/stdlib/set.rs:46): insert/overwrite."""
    return merge(col, F.create_map(F.lit(key), value))


def remove(col: Column, key: str) -> Column:
    """src/stdlib/remove.rs:69"""
    return F.map_filter(col, lambda k, _: k != F.lit(key))


def keys(col: Column) -> Column:
    return F.map_keys(col)


def values(col: Column) -> Column:
    return F.map_values(col)


def to_entries(col: Column) -> Column:
    """map -> array<struct<key,value>> (src/stdlib/to_entries.rs)."""
    return F.map_entries(col)


def from_entries(col: Column) -> Column:
    """src/stdlib/from_entries.rs"""
    return F.map_from_entries(col)


def map_keys(col: Column, fn: Callable[[Column], Column]) -> Column:
    """Closure fn over keys (src/stdlib/map_keys.rs)."""
    return F.transform_keys(col, lambda k, _: fn(k))


def map_values(col: Column, fn: Callable[[Column], Column]) -> Column:
    return F.transform_values(col, lambda _, v: fn(v))


def filter_map(col: Column, pred: Callable[[Column, Column], Column]) -> Column:
    """src/stdlib/filter.rs (object case)."""
    return F.map_filter(col, pred)


# --- arrays ----------------------------------------------------------


def push(col: Column, item: Column) -> Column:
    """src/stdlib/push.rs — append, returns new array."""
    return F.array_append(col, item)


def pop(col: Column) -> Column:
    """src/stdlib/pop.rs — array without last element."""
    return F.slice(col, 1, F.greatest(F.size(col) - 1, F.lit(0)))


def append(a: Column, b: Column) -> Column:
    """src/stdlib/append.rs — concat arrays."""
    return F.concat(a, b)


def unique(col: Column) -> Column:
    """src/stdlib/unique.rs — dedupe keeping first occurrence
    (array_distinct keeps first: matches)."""
    return F.array_distinct(col)


def includes(col: Column, item) -> Column:
    """src/stdlib/includes.rs"""
    return F.array_contains(col, item)


def chunks(col: Column, size: int) -> Column:
    """src/stdlib/chunks.rs — array -> array of size-n arrays."""
    n = F.size(col)
    last = F.greatest(F.ceil(n.cast("double") / size).cast("int") - 1, F.lit(0))
    chunked = F.transform(
        F.sequence(F.lit(0), last), lambda i: F.slice(col, i * size + 1, size)
    )
    empty = F.filter(chunked, lambda _: F.lit(False))
    return F.when(n > 0, chunked).otherwise(empty)


def tally(col: Column) -> Column:
    """Count occurrences of each string in an array -> map
    (src/stdlib/tally.rs:35-37)."""
    return F.map_from_entries(
        F.transform(
            F.array_distinct(col),
            lambda v: F.struct(
                v.alias("key"),
                F.size(F.filter(col, lambda x: x == v)).alias("value"),
            ),
        )
    )


def tally_value(col: Column, value) -> Column:
    """src/stdlib/tally_value.rs"""
    return F.size(F.filter(col, lambda x: x == F.lit(value)))


def match_array(col: Column, pattern: str, all_: bool = False) -> Column:
    """src/stdlib/match_array.rs — any/all regex over array."""
    if all_:
        return F.forall(col, lambda x: x.rlike(pattern))
    return F.exists(col, lambda x: x.rlike(pattern))


def filter_array(col: Column, pred: Callable[[Column], Column]) -> Column:
    return F.filter(col, pred)


def zip_(a: Column, b: Column) -> Column:
    """src/stdlib/zip.rs"""
    return F.arrays_zip(a, b)


def object_from_array(col: Column) -> Column:
    """array of [k,v] pairs -> map (src/stdlib/object_from_array.rs)."""
    return F.map_from_entries(
        F.transform(col, lambda p: F.struct(
            F.element_at(p, 1).alias("key"), F.element_at(p, 2).alias("value")))
    )


def flatten_map(col: Column, separator: str = ".") -> Column:
    """One-level flatten of map<string, map<string,string>> -> dotted
    keys (src/stdlib/flatten.rs; deeper nesting is a schema-time
    transform in our engine since schemas are static, SURVEY §1.5)."""
    return F.map_from_entries(
        F.flatten(
            F.transform(
                F.map_entries(col),
                lambda e: F.transform(
                    F.map_entries(e.getField("value")),
                    lambda inner: F.struct(
                        F.concat_ws(separator, e.getField("key"), inner.getField("key")).alias("key"),
                        inner.getField("value").alias("value"),
                    ),
                ),
            )
        )
    )


# unnest is the one VRL function that is literally a relational
# operator (src/stdlib/unnest.rs:60-67): DataFrame-level explode.
def unnest(df, array_col: str, out_col: str | None = None):
    """df with array column -> one row per element (F.explode)."""
    return df.withColumn(out_col or array_col, F.explode(F.col(array_col)))


def flatten_json(
    col: Column, separator: str = ".", except_keys: list[str] | None = None
) -> Column:
    """src/stdlib/flatten.rs over the dynamic (JSON-string) lane —
    the DEEP flatten the static-schema `flatten` can't express:
    nested objects collapse to separator-joined keys recursively,
    nested arrays inline recursively, ``except_keys`` subtrees are
    kept verbatim (reference `except` parameter). Input and output
    are JSON strings (sorted keys); undecodable input -> NULL."""
    exc = set(except_keys or [])

    @pandas_udf(T.StringType())
    def _fl(s: pd.Series) -> pd.Series:
        import json as _json

        def flat_list(xs, out):
            for x in xs:
                if isinstance(x, list):
                    flat_list(x, out)
                else:
                    out.append(x)
            return out

        def flat_map(obj, prefix, out):
            for k, v in obj.items():
                key = f"{prefix}{separator}{k}" if prefix else k
                # reference flatten.rs checks the except set at EVERY
                # depth: an excepted nested object is kept verbatim
                # under its prefixed key
                if k in exc:
                    out[key] = v
                elif isinstance(v, dict):
                    flat_map(v, key, out)
                else:
                    out[key] = v
            return out

        def one(v):
            if v is None:
                return None
            try:
                val = _json.loads(v)
            except Exception:
                return None
            if isinstance(val, list):
                return _json.dumps(flat_list(val, []), separators=(",", ":"))
            if isinstance(val, dict):
                return _json.dumps(
                    flat_map(val, "", {}), sort_keys=True, separators=(",", ":")
                )
            return _json.dumps(val)

        return s.map(one)

    return _fl(col)

"""Remaining stdlib surface: type predicates, ids, env, encode_csv,
punycode, community_id, unflatten.

Nondeterminism policy: VRL's uuid_v4/random_* are nondeterministic by
nature; a distributed pipeline that must satisfy routed-row EQUALITY
re-runs (north rule) cannot use them for identity. We therefore also
provide ``deterministic_id`` (content-derived UUIDv5-style) and seeded
``random_*`` variants, and document the trade."""

from __future__ import annotations

import os
import socket
import time

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- type predicates (src/stdlib/is_*.rs) — static-schema versions ---

_KIND_OF = {
    T.StringType: "string", T.LongType: "integer", T.IntegerType: "integer",
    T.DoubleType: "float", T.FloatType: "float", T.BooleanType: "boolean",
    T.TimestampType: "timestamp", T.NullType: "null",
}


def type_def(dtype: T.DataType) -> str:
    """Static kind name (VRL type_def/tag_types_externally analogue);
    Catalyst's schema IS the Kind lattice collapsed to a point."""
    if isinstance(dtype, T.ArrayType):
        return "array"
    if isinstance(dtype, (T.MapType, T.StructType)):
        return "object"
    return _KIND_OF.get(type(dtype), str(dtype))


def is_string(col: Column, dtype: T.DataType) -> Column:
    return F.lit(isinstance(dtype, T.StringType)) & col.isNotNull()


def is_integer(col: Column, dtype: T.DataType) -> Column:
    return F.lit(isinstance(dtype, (T.LongType, T.IntegerType))) & col.isNotNull()


def is_float(col: Column, dtype: T.DataType) -> Column:
    return F.lit(isinstance(dtype, (T.DoubleType, T.FloatType))) & col.isNotNull()


def is_boolean(col: Column, dtype: T.DataType) -> Column:
    return F.lit(isinstance(dtype, T.BooleanType)) & col.isNotNull()


def is_timestamp(col: Column, dtype: T.DataType) -> Column:
    return F.lit(isinstance(dtype, T.TimestampType)) & col.isNotNull()


def is_null(col: Column) -> Column:
    return col.isNull()


def is_array(col: Column, dtype: T.DataType) -> Column:
    """src/stdlib/is_array.rs — static-schema dispatch like the other
    type predicates: the column's Catalyst type IS the runtime kind."""
    return F.lit(isinstance(dtype, T.ArrayType)) & col.isNotNull()


def is_object(col: Column, dtype: T.DataType) -> Column:
    """src/stdlib/is_object.rs — maps and structs are both VRL
    objects."""
    return F.lit(isinstance(dtype, (T.MapType, T.StructType))) & col.isNotNull()


def is_array_json(col: Column) -> Column:
    """Dynamic (JSON-string lane) is_array: valid JSON whose top-level
    value is an array."""
    from vrl_spark.functions.coerce import is_json

    return is_json(col) & F.ltrim(col).startswith("[")


def is_object_json(col: Column) -> Column:
    """Dynamic (JSON-string lane) is_object."""
    from vrl_spark.functions.coerce import is_json

    return is_json(col) & F.ltrim(col).startswith("{")


def is_regex(value) -> bool:
    """src/stdlib/is_regex.rs — a TYPE predicate on regex values. VRL
    regexes are first-class runtime values; in this engine regex
    literals exist at PLAN time (Python ``re.Pattern`` objects / the
    pattern strings handed to parse_regex), so the faithful analogue
    is a plan-time predicate, not a Column."""
    import re

    return isinstance(value, re.Pattern)


def is_ipv6(col: Column) -> Column:
    return col.rlike(r"^(?:[0-9a-fA-F]{0,4}:){2,7}[0-9a-fA-F]{0,4}$")


# --- tag_types_externally (src/stdlib/tag_types_externally.rs) --------

# scalar tag names derive from the one kind table above; the narrow
# int types VRL also calls "integer" are added here only
_TAG_NAME = {
    **{k: v for k, v in _KIND_OF.items() if k is not T.NullType},
    T.ShortType: "integer", T.ByteType: "integer",
}


def tag_types_externally(col: Column, dtype: T.DataType) -> Column:
    """Static-schema tag_types_externally
    (src/stdlib/tag_types_externally.rs:105-138): every nested scalar
    becomes a one-field struct keyed by its VRL type name; objects and
    arrays keep their shape with tagged members; null stays null.

    Pure Column recursion over the Catalyst type — structs rebuild
    field-wise, arrays via ``transform``, maps via ``transform_values``
    — so the whole rewrite stays in whole-stage codegen (zero Python).
    The output type is itself static: e.g. ``struct<a:string>`` maps to
    ``struct<a:struct<string:string>>``."""
    if isinstance(dtype, T.StructType):
        # a NULL object is VRL Null and must STAY null — without the
        # guard the rebuild yields a non-null struct of tagged nulls
        return F.when(
            col.isNotNull(),
            F.struct(
                *[
                    tag_types_externally(col.getField(f.name), f.dataType)
                    .alias(f.name)
                    for f in dtype.fields
                ]
            ),
        )
    if isinstance(dtype, T.ArrayType):
        elem = dtype.elementType
        return F.transform(col, lambda x: tag_types_externally(x, elem))
    if isinstance(dtype, T.MapType):
        val = dtype.valueType
        return F.transform_values(
            col, lambda _k, v: tag_types_externally(v, val)
        )
    if isinstance(dtype, T.NullType):
        return col
    tag = _TAG_NAME.get(type(dtype))
    if tag is None:
        raise ValueError(
            f"tag_types_externally: unsupported scalar type {dtype}"
        )
    # a NULL scalar is VRL Null — untagged (reference :130), not
    # {tag: null}; F.when projects the same struct type either way
    return F.when(col.isNotNull(), F.struct(col.alias(tag)))


def tag_types_externally_json(col: Column) -> Column:
    """Dynamic (JSON-string lane) tag_types_externally: walk a parsed
    JSON document of unknown shape and wrap every scalar in its
    ``{"<type>": value}`` tag, preserving key order. Arrow-batched —
    the per-row Python walk is the cost of true dynamism; schema-known
    inputs should use the static lane above."""
    import json

    @F.pandas_udf("string")
    def _tag(s: pd.Series) -> pd.Series:
        def walk(v):
            if v is None:
                return None
            if isinstance(v, bool):
                return {"boolean": v}
            if isinstance(v, int):
                return {"integer": v}
            if isinstance(v, float):
                return {"float": v}
            if isinstance(v, str):
                return {"string": v}
            if isinstance(v, list):
                return [walk(x) for x in v]
            return {k: walk(x) for k, x in v.items()}

        def one(txt):
            if txt is None:
                return None
            try:
                doc = json.loads(txt)
            except ValueError:
                return None  # fallible expression: error lane is NULL
            return json.dumps(
                walk(doc), separators=(",", ":"), ensure_ascii=False
            )

        return s.map(one)

    return _tag(col)


# --- ids ---------------------------------------------------------------


def uuid_v4() -> Column:
    """src/stdlib/uuid_v4.rs — NONDETERMINISTIC (see module note)."""
    return F.uuid()


def deterministic_id(*cols: Column) -> Column:
    """Content-derived UUID (v5-ish shape): identical rows get
    identical ids across runs/retries — the id to use wherever the
    north rule's routed-row equality applies."""
    h = F.md5(F.concat_ws("\x1f", *cols))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8), F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.substring(h, 17, 4), F.substring(h, 21, 12),
    )


def random_int_seeded(lo: int, hi: int, seed: int = 42) -> Column:
    """src/stdlib/random_int.rs with pinned seed (deterministic)."""
    return (F.rand(seed) * (hi - lo)).cast("long") + lo


def random_float_seeded(seed: int = 42) -> Column:
    return F.rand(seed)


def random_bool_seeded(seed: int = 42) -> Column:
    return F.rand(seed) >= 0.5


_RANDOM_BYTES_MAX = 64 * 1024  # reference random_bytes.rs MAX_LENGTH


def _random_bytes_from(r: Column, length: int) -> Column:
    """Expand a per-row random double into ``length`` bytes via an
    md5 counter chain (16 bytes per block), JVM-side."""
    if length < 0:
        raise ValueError("Length cannot be negative")
    if length > _RANDOM_BYTES_MAX:
        raise ValueError("Length is too large. Maximum is 64k")
    if length == 0:
        return F.lit(b"")
    blocks = (length + 15) // 16
    hexcat = F.concat(
        *[
            F.md5(F.concat(F.lit(f"{i}|"), r.cast("string")))
            for i in range(blocks)
        ]
    )
    return F.unhex(F.substring(hexcat, 1, length * 2))


def random_bytes(length: int) -> Column:
    """src/stdlib/random_bytes.rs — NONDETERMINISTIC (unseeded rand
    source; see module note on the determinism policy). Plan-time
    length validation mirrors the reference's error cases."""
    return _random_bytes_from(F.rand(), length)


def random_bytes_seeded(length: int, seed: int = 42) -> Column:
    """Deterministic variant: same seed + same partitioning -> same
    bytes (the id to use where routed-row equality applies)."""
    return _random_bytes_from(F.rand(seed), length)


# --- environment (driver-side constants, src/stdlib/get_*.rs) --------


def get_env_var(name: str, default: str | None = None) -> Column:
    return F.lit(os.environ.get(name, default))


def get_hostname() -> Column:
    return F.lit(socket.gethostname())


def get_timezone_name() -> Column:
    return F.lit(time.tzname[0] or "UTC")


def now() -> Column:
    """src/stdlib/now.rs — pinned per-query by Spark (current_timestamp
    is constant within a query: good for lineage stamps)."""
    return F.current_timestamp()


# --- encode_csv / punycode / community_id ------------------------------


def encode_csv(col: Column) -> Column:
    """array<string> -> one CSV row (src/stdlib/encode_csv.rs):
    quote fields containing delimiter/quote/newline, double quotes."""
    return F.array_join(
        F.transform(
            col,
            lambda s: F.when(
                s.rlike('[",\n\r]'),
                F.concat(F.lit('"'), F.regexp_replace(s, '"', '""'), F.lit('"')),
            ).otherwise(s),
        ),
        ",",
    )


def encode_punycode(col: Column) -> Column:
    """src/stdlib/encode_punycode.rs — IDNA encode via Python stdlib
    (Arrow-batched; no JVM equivalent)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _enc(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return v.encode("idna").decode("ascii")
            except UnicodeError:
                return None  # error branch

        return s.map(one)

    return _enc(col)


def decode_punycode(col: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _dec(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            try:
                return v.encode("ascii").decode("idna")
            except (UnicodeError, UnicodeDecodeError):
                return None

        return s.map(one)

    return _dec(col)


def community_id(
    src_ip: Column, dst_ip: Column, src_port: Column, dst_port: Column,
    protocol: Column, seed: int = 0,
) -> Column:
    """src/stdlib/community_id.rs — Community ID v1 flow hash
    (sha1-based, ordered endpoints). Arrow-batched: needs binary
    packing no JVM builtin provides."""
    import hashlib
    import struct

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _cid(si: pd.Series, di: pd.Series, sp: pd.Series, dp: pd.Series,
             pr: pd.Series) -> pd.Series:
        import base64
        import socket as _s

        def one(s_ip, d_ip, s_p, d_p, proto):
            if s_ip is None or d_ip is None:
                return None
            try:
                sb, db = _s.inet_aton(s_ip), _s.inet_aton(d_ip)
            except OSError:
                return None
            s_p, d_p, proto = int(s_p or 0), int(d_p or 0), int(proto or 6)
            if (sb, s_p) > (db, d_p):  # canonical endpoint order
                sb, db, s_p, d_p = db, sb, d_p, s_p
            msg = struct.pack("!H", seed) + sb + db + struct.pack(
                "!BBHH", proto, 0, s_p, d_p
            )
            return "1:" + base64.b64encode(hashlib.sha1(msg).digest()).decode()

        return pd.Series([one(*args) for args in zip(si, di, sp, dp, pr)])

    return _cid(src_ip, dst_ip, src_port, dst_port, protocol)


# --- unflatten ----------------------------------------------------------


def unflatten_map(col: Column, separator: str = ".") -> Column:
    """Dotted keys -> one-level nested map<string, map<string,string>>
    (src/stdlib/unflatten.rs; static schemas make deep nesting a
    schema-time transform, SURVEY §1.5)."""
    entries = F.map_entries(col)
    outer_keys = F.array_distinct(
        F.transform(
            entries,
            lambda e: F.when(
                e.getField("key").contains(separator),
                F.substring_index(e.getField("key"), separator, 1),
            ).otherwise(e.getField("key")),
        )
    )
    import re as _re

    sep = _re.escape(separator)

    def inner_for(k: Column) -> Column:
        matching = F.filter(
            entries,
            lambda e: (e.getField("key") == k)
            | e.getField("key").startswith(F.concat(k, F.lit(separator))),
        )
        return F.map_from_entries(
            F.transform(
                matching,
                lambda e: F.struct(
                    F.when(
                        e.getField("key") == k, F.lit("")
                    ).otherwise(
                        F.regexp_replace(e.getField("key"), f"^.*?{sep}", "")
                    ).alias("key"),
                    e.getField("value").alias("value"),
                ),
            )
        )

    return F.map_from_entries(
        F.transform(outer_keys, lambda k: F.struct(k.alias("key"), inner_for(k).alias("value")))
    )


def uuid_v7(ts: Column | None = None) -> Column:
    """src/stdlib/uuid_v7.rs — time-ordered UUID. Deterministic
    variant: the random bits derive from md5 of the timestamp column
    (pass a per-row unique ts/expr for uniqueness; pinned for
    routed-row equality)."""
    t = F.current_timestamp() if ts is None else ts
    millis_hex = F.lpad(F.hex(F.unix_millis(t.cast("timestamp"))), 12, "0")
    h = F.md5(t.cast("string"))
    return F.lower(F.concat_ws(
        "-",
        F.substring(millis_hex, 1, 8),
        F.substring(millis_hex, 9, 4),
        F.concat(F.lit("7"), F.substring(h, 1, 3)),
        F.concat(F.lit("8"), F.substring(h, 4, 3)),
        F.substring(h, 7, 12),
    ))


def split_path(col: Column) -> Column:
    """Path -> array of components (src/stdlib/split_path.rs)."""
    return F.filter(F.split(col, "/"), lambda p: p != "")


def uuid_from_friendly_id(col: Column) -> Column:
    """base62 friendly-id -> canonical UUID hex form
    (src/stdlib/uuid_from_friendly_id.rs). Arrow-batched: needs
    128-bit base62 arithmetic."""
    from pyspark.sql.functions import pandas_udf

    _ALPHA = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

    @pandas_udf(T.StringType())
    def _conv(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            n = 0
            for ch in v:
                i = _ALPHA.find(ch)
                if i < 0:
                    return None
                n = n * 62 + i
            if n >= 1 << 128:
                return None
            h = f"{n:032x}"
            return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"

        return s.map(one)

    return _conv(col)

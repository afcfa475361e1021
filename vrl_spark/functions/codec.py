"""Codec / hash functions (reference src/stdlib/ encode_*, decode_*,
md5/sha*/crc/hmac, compression).

JVM built-ins wherever they exist; zlib/gzip and the exotic hashes go
through Arrow-batched pandas UDFs (stdlib `zlib`/`hashlib` — no extra
deps)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- base16 / base64 / percent (JVM) ---------------------------------


def encode_base16(col: Column) -> Column:
    """src/stdlib/encode_base16.rs (lowercase hex)."""
    return F.lower(F.hex(col.cast("binary")))


def decode_base16(col: Column) -> Column:
    return F.unhex(col).cast("string")


def encode_base64(col: Column, padding: bool = True) -> Column:
    """src/stdlib/encode_base64.rs"""
    out = F.base64(col.cast("binary"))
    if not padding:
        out = F.regexp_replace(out, "=+$", "")
    return out


def decode_base64(col: Column) -> Column:
    return F.unbase64(col).cast("string")


def encode_percent(col: Column) -> Column:
    """src/stdlib/encode_percent.rs"""
    return F.url_encode(col)


def decode_percent(col: Column) -> Column:
    return F.try_url_decode(col)


def encode_json(col: Column) -> Column:
    """src/stdlib/encode_json.rs — VRL objects are BTreeMaps (sorted
    keys, src/value/value.rs:34); declare struct fields sorted at
    schema build so to_json output order matches."""
    return F.to_json(col)


def encode_logfmt(col: Column) -> Column:
    """src/stdlib/encode_logfmt.rs — map -> 'k=v k2=v2', SORTED keys
    (via src/core/encode_key_value.rs)."""
    entries = F.map_entries(col)
    sorted_entries = F.array_sort(entries)
    parts = F.transform(
        sorted_entries,
        lambda e: F.concat(
            e.getField("key"),
            F.lit("="),
            F.when(
                e.getField("value").rlike(r"[\s\"=]"),
                F.concat(
                    F.lit('"'),
                    F.regexp_replace(e.getField("value"), '"', '\\\\"'),
                    F.lit('"'),
                ),
            ).otherwise(e.getField("value")),
        ),
    )
    return F.array_join(parts, " ")


# --- hashes (JVM where possible) -------------------------------------


def md5(col: Column) -> Column:
    return F.md5(col.cast("binary"))


def sha1(col: Column) -> Column:
    return F.sha1(col.cast("binary"))


def sha2(col: Column, variant: int = 256) -> Column:
    """src/stdlib/sha2.rs — variant in 224/256/384/512."""
    return F.sha2(col.cast("binary"), variant)


def crc(col: Column) -> Column:
    """src/stdlib/crc.rs (crc32 default)."""
    return F.crc32(col.cast("binary")).cast("string")


def xxhash(col: Column) -> Column:
    """64-bit xxHash — Spark ships xxhash64 natively."""
    return F.xxhash64(col)


def sha3(col: Column, variant: int = 512) -> Column:
    """src/stdlib/sha3.rs — no JVM builtin; Arrow-batched hashlib."""

    @pandas_udf(T.StringType())
    def _sha3(s: pd.Series) -> pd.Series:
        import hashlib

        name = f"sha3_{variant}"
        return s.map(
            lambda v: getattr(hashlib, name)(v.encode()).hexdigest()
            if v is not None
            else None
        )

    return _sha3(col)


def hmac_(col: Column, key: str, algorithm: str = "sha256") -> Column:
    """src/stdlib/hmac.rs — Arrow-batched stdlib hmac."""

    @pandas_udf(T.StringType())
    def _hmac(s: pd.Series) -> pd.Series:
        import hashlib
        import hmac as _h

        k = key.encode()
        return s.map(
            lambda v: _h.new(k, v.encode(), getattr(hashlib, algorithm)).hexdigest()
            if v is not None
            else None
        )

    return _hmac(col)


# --- compression (Arrow-batched stdlib zlib/gzip) --------------------


def encode_zlib(col: Column) -> Column:
    """src/stdlib/encode_zlib.rs"""

    @pandas_udf(T.BinaryType())
    def _z(s: pd.Series) -> pd.Series:
        import zlib

        return s.map(lambda v: zlib.compress(v) if v is not None else None)

    return _z(col.cast("binary"))


def decode_zlib(col: Column) -> Column:
    @pandas_udf(T.BinaryType())
    def _z(s: pd.Series) -> pd.Series:
        import zlib

        def one(v):
            if v is None:
                return None
            try:
                return zlib.decompress(v)
            except zlib.error:
                return None  # error branch: data, not throw

        return s.map(one)

    return _z(col)


def encode_gzip(col: Column) -> Column:
    @pandas_udf(T.BinaryType())
    def _g(s: pd.Series) -> pd.Series:
        import gzip as _gz

        # mtime pinned for determinism (VRL results must be stable)
        return s.map(
            lambda v: _gz.compress(v, mtime=0) if v is not None else None
        )

    return _g(col.cast("binary"))


def decode_gzip(col: Column) -> Column:
    @pandas_udf(T.BinaryType())
    def _g(s: pd.Series) -> pd.Series:
        import gzip as _gz

        def one(v):
            if v is None:
                return None
            try:
                return _gz.decompress(v)
            except OSError:
                return None

        return s.map(one)

    return _g(col)


# --- RFC 2047 encoded-words + charset transcoding ---------------------


def decode_mime_q(col: Column) -> Column:
    """src/stdlib/decode_mime_q.rs — replace every ``=?charset?b|q?..?=``
    encoded-word with its decoded text, preserving the literal text
    between words. A bare internal form without the ``=?``/``?=``
    delimiters (and optionally without a charset, defaulting utf-8) is
    accepted when the whole string is one word, matching the
    reference's parse_internal_q fallback. Undecodable input -> NULL
    (the error branch)."""

    @pandas_udf(T.StringType())
    def _dq(s: pd.Series) -> pd.Series:
        import base64 as _b64
        import quopri as _qp
        import re as _re

        delimited = _re.compile(r"=\?([^?]*)\?([bBqQ])\?([^?]*)\?=")
        internal = _re.compile(r"^(?:=\?)?([^?]*)\?([bBqQ])\?([^?]*?)(?:\?=)?$")

        def decode_word(charset, enc, text):
            cs = charset.strip() or "utf-8"
            if enc in ("b", "B"):
                raw = _b64.b64decode(text, validate=True)
            else:
                raw = _qp.decodestring(text.replace("_", " ").encode("ascii"))
            return raw.decode(cs)

        def one(v):
            if v is None:
                return None
            try:
                out, pos, hit = [], 0, False
                for m in delimited.finditer(v):
                    hit = True
                    out.append(v[pos : m.start()])
                    out.append(decode_word(*m.groups()))
                    pos = m.end()
                if hit:
                    out.append(v[pos:])
                    return "".join(out)
                m = internal.match(v)
                if m:
                    return decode_word(*m.groups())
                return v
            except Exception:
                return None

        return s.map(one)

    return _dq(col)


def decode_charset(col: Column, from_charset: str) -> Column:
    """src/stdlib/decode_charset.rs — decode legacy-charset bytes to
    UTF-8 text. Unknown charset fails at plan build (the reference's
    compile-time label lookup); malformed sequences become U+FFFD,
    matching encoding_rs's replacement decode."""
    import codecs as _codecs

    _codecs.lookup(from_charset)  # unknown charset -> build-time error

    @pandas_udf(T.StringType())
    def _dc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: v.decode(from_charset, errors="replace") if v is not None else None
        )

    return _dc(col.cast("binary"))


def encode_charset(col: Column, to_charset: str) -> Column:
    """src/stdlib/encode_charset.rs — encode UTF-8 text into a legacy
    charset. Unmappable characters become XML numeric references
    (&#NNNN;), the encoding_rs lossy-encode behavior the reference
    inherits."""
    import codecs as _codecs

    _codecs.lookup(to_charset)

    @pandas_udf(T.BinaryType())
    def _ec(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: v.encode(to_charset, errors="xmlcharrefreplace")
            if v is not None
            else None
        )

    return _ec(col)


# --- seahash (src/stdlib/seahash.rs) ----------------------------------

_SEA_P = 0x6EED0E9DA4D94A4F
_SEA_M = (1 << 64) - 1


def _seahash_bytes(buf: bytes) -> int:
    """Portable SeaHash (the public spec: 4-lane diffuse over 64-bit
    little-endian words, partial tail word, length-mixed finalizer).
    Validated against the reference's test vectors (seahash.rs:92-99).
    Returns the SIGNED 64-bit value VRL emits."""

    def diffuse(x: int) -> int:
        x = (x * _SEA_P) & _SEA_M
        x ^= (x >> 32) >> (x >> 60)
        return (x * _SEA_P) & _SEA_M

    n = len(buf)
    regs = [0x16F11FE89B0D677C, 0xB480A793D8E6C86C,
            0x6FE2E5AAF078EBC9, 0x14F994A4C5259381]
    i = 0
    end = n & ~0x1F
    while i < end:
        for k in range(4):
            regs[k] = diffuse(
                regs[k] ^ int.from_bytes(buf[i + 8 * k : i + 8 * k + 8], "little")
            )
        i += 32
    rest = buf[i:]
    k = 0
    while len(rest) >= 8:
        regs[k] = diffuse(regs[k] ^ int.from_bytes(rest[:8], "little"))
        rest, k = rest[8:], k + 1
    if rest:
        regs[k] = diffuse(regs[k] ^ int.from_bytes(rest, "little"))
    out = diffuse(regs[0] ^ regs[1] ^ regs[2] ^ regs[3] ^ n)
    return out - (1 << 64) if out >= (1 << 63) else out


def seahash(col: Column) -> Column:
    """src/stdlib/seahash.rs — non-cryptographic SeaHash as signed
    int64 (Arrow-batched; use xxhash64 for JVM-side hashing when
    reference-exact values aren't required)."""

    @pandas_udf(T.LongType())
    def _sh(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _seahash_bytes(bytes(v)) if v is not None else None)

    return _sh(col.cast("binary"))

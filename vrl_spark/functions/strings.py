"""String functions (reference src/stdlib/, category Strings).

Pure JVM Column expressions — whole-stage codegen, no Python — except
the SHA-512/256 / SHA3 redactor variants of ``redact_hash``, which
Spark's expression library lacks (one Arrow-batched UDF there).
Semantics notes per function cite the reference file.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# --- casing (reference src/stdlib/casing/*) --------------------------


def downcase(col: Column) -> Column:
    return F.lower(col)


def upcase(col: Column) -> Column:
    return F.upper(col)


def _words(col: Column) -> Column:
    """Split an identifier into words: handles sep chars and camel
    boundaries (the reference delegates to the `convert_case` crate)."""
    spaced = F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1 $2")
    spaced = F.regexp_replace(spaced, r"([A-Z]+)([A-Z][a-z])", r"$1 $2")
    spaced = F.regexp_replace(spaced, r"[_\-\s]+", " ")
    return F.split(F.trim(spaced), " ")


def snakecase(col: Column) -> Column:
    return F.lower(F.array_join(_words(col), "_"))


def kebabcase(col: Column) -> Column:
    return F.lower(F.array_join(_words(col), "-"))


def screamingsnakecase(col: Column) -> Column:
    return F.upper(F.array_join(_words(col), "_"))


def camelcase(col: Column) -> Column:
    from vrl_spark.functions.parse import bind

    def body(w: Column) -> Column:
        # w bound once: 3 references would otherwise re-run the
        # 3-regex word split 3x
        first = F.lower(F.element_at(w, 1))
        rest = F.transform(
            F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
            lambda s: F.concat(
                F.upper(s.substr(F.lit(1), F.lit(1))),
                F.lower(s.substr(F.lit(2), F.length(s))),
            ),
        )
        return F.concat(first, F.array_join(rest, ""))

    return bind(_words(col), body)


def pascalcase(col: Column) -> Column:
    w = _words(col)
    parts = F.transform(
        w,
        lambda s: F.concat(F.upper(s.substr(F.lit(1), F.lit(1))), F.lower(s.substr(F.lit(2), F.length(s)))),
    )
    return F.array_join(parts, "")


# --- predicates ------------------------------------------------------


def contains(col: Column, substring: str, case_sensitive: bool = True) -> Column:
    """src/stdlib/contains.rs"""
    if case_sensitive:
        return col.contains(substring)
    return F.lower(col).contains(substring.lower())


def contains_all(col: Column, substrings: list[str], case_sensitive: bool = True) -> Column:
    """src/stdlib/contains_all.rs"""
    out = F.lit(True)
    for s in substrings:
        out = out & contains(col, s, case_sensitive)
    return out


def starts_with(col: Column, prefix: str, case_sensitive: bool = True) -> Column:
    if case_sensitive:
        return col.startswith(prefix)
    return F.lower(col).startswith(prefix.lower())


def ends_with(col: Column, suffix: str, case_sensitive: bool = True) -> Column:
    if case_sensitive:
        return col.endswith(suffix)
    return F.lower(col).endswith(suffix.lower())


def match_(col: Column, pattern: str) -> Column:
    """VRL `match` — regex test (src/stdlib/match.rs)."""
    return col.rlike(pattern)


def match_any(col: Column, patterns: list[str]) -> Column:
    """src/stdlib/match_any.rs — single alternation pass."""
    return col.rlike("|".join(f"(?:{p})" for p in patterns))


# --- transforms ------------------------------------------------------


def replace(col: Column, pattern: str, replacement: str, regex: bool = False) -> Column:
    """src/stdlib/replace.rs (count option unsupported: all occurrences,
    the VRL default count=-1)."""
    if regex:
        return F.regexp_replace(col, pattern, replacement)
    import re as _re

    return F.regexp_replace(col, _re.escape(pattern), replacement.replace("$", "\\$"))


def split(col: Column, pattern: str, limit: int = -1) -> Column:
    """src/stdlib/split.rs — regex split with limit."""
    return F.split(col, pattern, limit)


def join(col: Column, separator: str = "") -> Column:
    """src/stdlib/join.rs — array -> string."""
    return F.array_join(col, separator)


def slice_(col: Column, start: int, end: int | None = None) -> Column:
    """src/stdlib/slice.rs — negative indices from the end (string)."""
    length = F.length(col)
    s = F.lit(start) if start >= 0 else length + start
    e = (F.lit(end) if end >= 0 else length + end) if end is not None else length
    s = F.greatest(s, F.lit(0))
    n = F.greatest(e - s, F.lit(0))
    return F.substring(col, s + 1, n)


def truncate(col: Column, limit: int, suffix: str = "") -> Column:
    """src/stdlib/truncate.rs — cut at `limit` chars, optional suffix
    appended only when truncation happened."""
    cut = F.substring(col, 1, limit)
    return F.when(F.length(col) > limit, F.concat(cut, F.lit(suffix))).otherwise(col)


def strip_whitespace(col: Column) -> Column:
    return F.trim(col)


def strip_ansi_escape_codes(col: Column) -> Column:
    """src/stdlib/strip_ansi_escape_codes.rs"""
    return F.regexp_replace(col, r"\x1b\[[0-9;]*[a-zA-Z]|\x1b\].*?(\x07|\x1b\\)", "")


def sieve(
    col: Column,
    permitted: str,
    replace_single: str = "",
    replace_repeated: str = "",
) -> Column:
    """src/stdlib/sieve.rs — keep only substrings matching the
    permitted pattern; single vs repeated disallowed runs get distinct
    replacements."""
    one = f"(?:(?!{permitted}).)"
    out = F.regexp_replace(col, f"{one}{{2,}}", replace_repeated.replace("$", "\\$"))
    return F.regexp_replace(out, one, replace_single.replace("$", "\\$"))


def redact(col: Column, patterns: list[str], redactor: str = "[REDACTED]") -> Column:
    """src/stdlib/redact.rs — full/text redactor modes (replace every
    regex match with a fixed string). For the sha2/sha3 redactor modes
    use ``redact_hash``."""
    out = col
    for p in patterns:
        out = F.regexp_replace(out, p, redactor.replace("$", "\\$"))
    return out


def _interleave_hashed(col: Column, pattern: str, hash_fn) -> Column:
    """Replace every match of ``pattern`` with hash_fn(match), pure
    JVM: split on the pattern for the unmatched segments, extract the
    matches, hash each, and re-interleave. No UDF, no second regex
    engine — the redact hot path stays in codegen."""
    from vrl_spark.functions.parse import bind

    def with_segs(segs: Column) -> Column:
        def with_matches(ms: Column) -> Column:
            tail = F.zip_with(
                F.transform(ms, hash_fn),
                F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0))),
                lambda h, nxt: F.concat(h, nxt),
            )
            return F.concat(F.element_at(segs, 1), F.array_join(tail, ""))

        return bind(F.regexp_extract_all(col, F.lit(f"({pattern})"), 1), with_matches)

    return bind(F.split(col, pattern, -1), with_segs)


def redact_hash(
    col: Column,
    patterns: list[str],
    algorithm: str = "sha2",
    variant: str | None = None,
    encoding: str = "base64",
) -> Column:
    """src/stdlib/redact.rs sha2/sha3 redactor modes: each match is
    replaced by hash(match) encoded base16/base64. Defaults mirror the
    reference: sha2 -> SHA-512/256, sha3 -> SHA3-512, base64.

    Lowering: SHA-224/256/384/512 + base16/base64 run fully JVM-side
    (F.sha2 + unhex/base64 over the match array); SHA-512/256 and the
    SHA3 family aren't in Spark's expression library, so those
    variants run as one Arrow-batched pandas UDF (hashlib)."""
    if algorithm == "sha2":
        variant = variant or "SHA-512/256"
        jvm_bits = {"SHA-224": 224, "SHA-256": 256, "SHA-384": 384, "SHA-512": 512}
        if variant in jvm_bits:
            bits = jvm_bits[variant]

            def hash_fn(m: Column) -> Column:
                hx = F.sha2(m, bits)
                return hx if encoding == "base16" else F.base64(F.unhex(hx))

            out = col
            for p in patterns:
                out = _interleave_hashed(out, p, hash_fn)
            return out
        if variant != "SHA-512/256":
            raise ValueError(f"invalid sha2 variant {variant!r}")
        hashlib_name = "sha512_256"
    elif algorithm == "sha3":
        variant = variant or "SHA3-512"
        table = {
            "SHA3-224": "sha3_224", "SHA3-256": "sha3_256",
            "SHA3-384": "sha3_384", "SHA3-512": "sha3_512",
        }
        if variant not in table:
            raise ValueError(f"invalid sha3 variant {variant!r}")
        hashlib_name = table[variant]
    else:
        raise ValueError(f"invalid hash redactor {algorithm!r}")
    if encoding not in ("base16", "base64"):
        raise ValueError(f"invalid encoding {encoding!r}")

    pats, enc = list(patterns), encoding

    @pandas_udf(T.StringType())
    def _r(s: pd.Series) -> pd.Series:
        import base64 as _b64
        import hashlib as _hl
        import re as _re

        compiled = [_re.compile(p) for p in pats]

        def hash_match(m):
            d = _hl.new(hashlib_name, m.group(0).encode()).digest()
            return d.hex() if enc == "base16" else _b64.b64encode(d).decode()

        def one(v):
            if v is None:
                return None
            for p in compiled:
                v = p.sub(hash_match, v)
            return v

        return s.map(one)

    return _r(col)


# --- measures --------------------------------------------------------


def strlen(col: Column) -> Column:
    """src/stdlib/strlen.rs — CHARS not bytes (F.length on string is
    chars: matches)."""
    return F.length(col)


def length_bytes(col: Column) -> Column:
    """VRL `length` on a string counts BYTES (src/stdlib/length.rs)."""
    return F.octet_length(col)


def find(col: Column, substring: str) -> Column:
    """src/stdlib/find.rs — 0-based index or -1."""
    return F.locate(substring, col) - 1


def basename(col: Column) -> Column:
    """src/stdlib/basename.rs"""
    return F.regexp_extract(col, r"([^/]*)/?$", 1)


def dirname(col: Column) -> Column:
    """src/stdlib/dirname.rs"""
    stripped = F.regexp_replace(col, r"/+[^/]*/*$", "")
    return F.when(stripped == "", F.when(col.startswith("/"), "/").otherwise(".")).otherwise(stripped)


def format_int(col: Column, base: int) -> Column:
    """src/stdlib/format_int.rs — int -> string in radix."""
    return F.lower(F.conv(col.cast("string"), 10, base))


def format_number(
    col: Column, scale: int, decimal_separator: str = ".",
    grouping_separator: str = ","
) -> Column:
    """src/stdlib/format_number.rs"""
    formatted = F.format_number(col, scale)
    if grouping_separator != "," or decimal_separator != ".":
        formatted = F.translate(formatted, ",.", grouping_separator + decimal_separator)
    return formatted


def format_timestamp(col: Column, fmt: str) -> Column:
    """src/stdlib/format_timestamp.rs — chrono tokens."""
    from vrl_spark.functions.parse import chrono_to_java

    return F.date_format(col, chrono_to_java(fmt))


def shannon_entropy(col: Column) -> Column:
    """src/stdlib/shannon_entropy.rs — bits/char over the char
    distribution. JVM-only lowering, linear work: bind the char split
    once (an unbound reference would re-split per distinct char x2),
    compute one count per distinct char, then fold -p*log2(p)."""
    from vrl_spark.functions.parse import bind

    def body(chars: Column) -> Column:
        n = F.size(chars).cast("double")
        counts = F.transform(
            F.array_distinct(chars),
            lambda c: F.size(F.filter(chars, lambda x: x == c)).cast("double"),
        )
        return F.aggregate(
            counts,
            F.lit(0.0),
            lambda acc, cnt: acc - (cnt / n) * F.log2(cnt / n),
        )

    return bind(F.split(col, ""), body)

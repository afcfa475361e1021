"""Math, IP, and syslog functions (reference src/stdlib/).

IPv4 functions lower to pure integer arithmetic (JVM-side, no Python)
— an IPv4 is just a u32. Syslog lookups are when-cascades."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- math (src/stdlib/{abs,ceil,floor,round,mod}.rs) -----------------


def abs_(col: Column) -> Column:
    return F.abs(col)


def ceil_(col: Column, precision: int = 0) -> Column:
    """src/stdlib/ceil.rs — precision = decimal places."""
    factor = 10 ** precision
    return F.ceil(col * factor) / factor if precision else F.ceil(col).cast("double")


def floor_(col: Column, precision: int = 0) -> Column:
    factor = 10 ** precision
    return F.floor(col * factor) / factor if precision else F.floor(col).cast("double")


def round_(col: Column, precision: int = 0) -> Column:
    """src/stdlib/round.rs — half-away-from-zero, same as Spark round."""
    return F.round(col, precision)


def mod_(a: Column, b: Column) -> Column:
    """VRL mod errors on zero rhs (src/stdlib/mod_func.rs) — here the
    error branch is NULL. Rust % truncates toward zero (like Spark %,
    unlike pmod)."""
    return F.when(b != 0, a % b)


def haversine(lat1, lon1, lat2, lon2) -> Column:
    """src/stdlib/haversine.rs — great-circle km."""
    r = 6371.0
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * r) * F.asin(F.sqrt(a))


# --- ipv4 as u32 arithmetic (src/stdlib/ip_*.rs) ---------------------

_OCTET = r"(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})"


def ip_aton(col: Column) -> Column:
    """dotted quad -> u32 (src/stdlib/ip_aton.rs). Bad input -> NULL.

    bind keeps this to ONE regex (format check) + ONE split per call —
    the old per-octet regexp_extract ran the pattern five times, and
    every caller reference multiplied that again (Catalyst trees)."""
    from vrl_spark.functions.parse import bind

    def outer(c: Column) -> Column:
        fmt_ok = c.rlike("^" + _OCTET + "$")

        def inner(parts: Column) -> Column:
            o = [F.element_at(parts, i).try_cast("long") for i in range(1, 5)]
            ok = fmt_ok
            for x in o:
                ok = ok & (x <= 255)
            return F.when(ok, o[0] * 16777216 + o[1] * 65536 + o[2] * 256 + o[3])

        return bind(F.split(c, r"\."), inner)

    return bind(col, outer)


def ip_ntoa(col: Column) -> Column:
    """u32 -> dotted quad (src/stdlib/ip_ntoa.rs). bind: the input
    expression evaluates once, not once per octet."""
    from vrl_spark.functions.parse import bind

    def body(c: Column) -> Column:
        return F.when(
            (c >= 0) & (c <= 4294967295),
            F.concat_ws(
                ".",
                ((c / 16777216).cast("long") % 256).cast("string"),
                ((c / 65536).cast("long") % 256).cast("string"),
                ((c / 256).cast("long") % 256).cast("string"),
                (c % 256).cast("string"),
            ),
        )

    return bind(col, body)


def ip_cidr_contains(cidr: str, col: Column) -> Column:
    """src/stdlib/ip_cidr_contains.rs — v4 only; mask arithmetic."""
    base, bits = cidr.split("/")
    bits = int(bits)
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
    base_int = sum(
        int(p) << (8 * (3 - i)) for i, p in enumerate(base.split("."))
    )
    ip_int = ip_aton(col)
    return (ip_int.bitwiseAND(F.lit(mask))) == F.lit(base_int & mask)


def ip_to_ipv6(col: Column) -> Column:
    """src/stdlib/ip_to_ipv6.rs — v4 -> '::ffff:a.b.c.d'."""
    return F.when(
        col.rlike("^" + _OCTET + "$"), F.concat(F.lit("::ffff:"), col)
    ).otherwise(col)


def ipv6_to_ipv4(col: Column) -> Column:
    """src/stdlib/ipv6_to_ipv4.rs — '::ffff:a.b.c.d' -> dotted quad."""
    return F.when(
        F.lower(col).rlike(r"^::ffff:" + _OCTET + "$"),
        F.regexp_replace(F.lower(col), "^::ffff:", ""),
    ).when(col.rlike("^" + _OCTET + "$"), col)


# --- syslog (src/stdlib/to_syslog_*.rs) ------------------------------

_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]

_SEVERITIES = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]

# syslog level name per severity code (to_syslog_level.rs)
_LEVELS = _SEVERITIES


def to_syslog_facility(code: Column) -> Column:
    """facility code -> keyword (src/stdlib/to_syslog_facility.rs)."""
    out = None
    for i, name in enumerate(_FACILITIES):
        out = F.when(code == i, name) if out is None else out.when(code == i, name)
    return out


def to_syslog_facility_code(name: Column) -> Column:
    out = None
    for i, fac in enumerate(_FACILITIES):
        out = F.when(name == fac, i) if out is None else out.when(name == fac, i)
    return out.cast("long")


def to_syslog_severity(level: Column) -> Column:
    """keyword -> severity code (src/stdlib/to_syslog_severity.rs)."""
    out = None
    for i, name in enumerate(_SEVERITIES):
        out = F.when(level == name, i) if out is None else out.when(level == name, i)
    return out.cast("long")


def to_syslog_level(severity: Column) -> Column:
    out = None
    for i, name in enumerate(_LEVELS):
        out = F.when(severity == i, name) if out is None else out.when(severity == i, name)
    return out


# --- VRL arithmetic semantics (src/compiler/value/arithmetic.rs) -----


def vrl_div(a: Column, b: Column) -> Column:
    """int/int -> float ALWAYS; div-by-zero errors (-> NULL)
    (arithmetic.rs:98-110). Spark's int/int already yields double;
    we add the explicit zero guard."""
    return F.when(b != 0, a.cast("double") / b.cast("double"))


def vrl_mul_string(s: Column, n: Column) -> Column:
    """string * int repeats (arithmetic.rs:68-95)."""
    return F.repeat(s, n.cast("int"))


def vrl_add_string(a: Column, b: Column) -> Column:
    """string + string concat; string + null -> string
    (arithmetic.rs:113-134)."""
    return F.concat(F.coalesce(a, F.lit("")), F.coalesce(b, F.lit("")))


def vrl_float_guard(col: Column) -> Column:
    """NaN results error in VRL (NotNan, arithmetic.rs:60-64)."""
    return F.when(~F.isnan(col), col)


# Reference int arithmetic WRAPS on overflow (i64::wrapping_add/mul,
# arithmetic.rs:81-115) where ANSI Spark errors. These lower the wrap
# through DECIMAL space: the true sum/product fits decimal(38,0)
# (|a*b| < 2^126 < 10^38), then pmod 2^64 re-centers into i64 range.
from decimal import Decimal as _Dec  # noqa: E402

_TWO64 = _Dec(1 << 64)
_TWO63 = _Dec(1 << 63)


def _wrap_to_i64(wide: Column) -> Column:
    centered = F.pmod(
        wide + F.lit(_TWO63).cast("decimal(38,0)"),
        F.lit(_TWO64).cast("decimal(38,0)"),
    )
    return (centered - F.lit(_TWO63).cast("decimal(38,0)")).cast("long")


def vrl_add_wrapping(a: Column, b: Column) -> Column:
    """i64::wrapping_add (arithmetic.rs:115) — reference-exact
    two's-complement overflow."""
    return _wrap_to_i64(a.cast("decimal(20,0)") + b.cast("decimal(20,0)"))


def vrl_sub_wrapping(a: Column, b: Column) -> Column:
    """i64::wrapping_sub (arithmetic.rs:123)."""
    return _wrap_to_i64(a.cast("decimal(20,0)") - b.cast("decimal(20,0)"))


def vrl_mul_wrapping(a: Column, b: Column) -> Column:
    """i64::wrapping_mul (arithmetic.rs:81)."""
    return _wrap_to_i64(
        a.cast("decimal(19,0)").cast("decimal(38,0)")
        * b.cast("decimal(19,0)")
    )


def ip_pton(col: Column) -> Column:
    """v4 dotted quad -> 4-byte binary (src/stdlib/ip_pton.rs)."""
    return F.unhex(F.lpad(F.hex(ip_aton(col)), 8, "0"))


def ip_ntop(col: Column) -> Column:
    """4-byte binary -> dotted quad (src/stdlib/ip_ntop.rs)."""
    return ip_ntoa(F.conv(F.hex(col), 16, 10).cast("long"))


def ip_subnet(col: Column, mask: str) -> Column:
    """Apply a subnet mask: '255.255.0.0' or '/16' (src/stdlib/ip_subnet.rs)."""
    if mask.startswith("/"):
        bits = int(mask[1:])
        mask_int = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
    else:
        mask_int = sum(
            int(p) << (8 * (3 - i)) for i, p in enumerate(mask.split("."))
        )
    return ip_ntoa(ip_aton(col).bitwiseAND(F.lit(mask_int)))

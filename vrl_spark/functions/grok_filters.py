"""Datadog-grok per-field post-filters (reference
src/datadog/grok/grok_filter.rs:20-44): each captured string field can
carry a filter chain (`%{NUMBER:size:scale(10)}`); filters apply
after extraction.

Each filter is a Column -> Column transform; ``apply_filters`` runs a
named chain. The full reference set: date, integer, integerExt,
number, numberExt, nullIf, scale, lowercase, uppercase, json,
rubyhash, querystring, boolean, decodeuricomponent, xml, array,
keyvalue."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vrl_spark.functions import parse as P
from vrl_spark.functions.coerce import _FALSE_STRINGS, _TRUE_STRINGS


def f_integer(c: Column) -> Column:
    return c.try_cast("long")


def f_integer_ext(c: Column) -> Column:
    """integerExt: scientific notation allowed (1e3 -> 1000)."""
    return c.try_cast("double").try_cast("long")


def f_number(c: Column) -> Column:
    return c.try_cast("double")


f_number_ext = f_number  # numberExt == number with sci notation (cast handles)


def f_null_if(value: str):
    def fn(c: Column) -> Column:
        return F.when(c != value, c)

    return fn


def f_scale(factor: float):
    def fn(c: Column) -> Column:
        return c.try_cast("double") * factor

    return fn


def f_lowercase(c: Column) -> Column:
    return F.lower(c)


def f_uppercase(c: Column) -> Column:
    return F.upper(c)


def f_json(c: Column) -> Column:
    return F.try_parse_json(c)


def f_boolean(c: Column) -> Column:
    lowered = F.lower(F.trim(c))
    return (
        F.when(lowered.isin(_TRUE_STRINGS), F.lit(True))
        .when(lowered.isin(_FALSE_STRINGS), F.lit(False))
    )


def f_decodeuricomponent(c: Column) -> Column:
    return F.try_url_decode(c)


def f_date(fmt: str):
    def fn(c: Column) -> Column:
        return P.parse_timestamp(c, fmt)

    return fn


def f_array(separator: str = ","):
    def fn(c: Column) -> Column:
        trimmed = F.regexp_replace(c, r"^\[|\]$", "")
        return F.transform(F.split(trimmed, separator), lambda x: F.trim(x))

    return fn


def f_keyvalue(c: Column) -> Column:
    return P.parse_key_value_native(c)


def f_querystring(c: Column) -> Column:
    return P.parse_query_string(c)


def f_rubyhash(c: Column) -> Column:
    from vrl_spark.functions.formats import parse_ruby_hash

    return parse_ruby_hash(c)


def f_xml(c: Column) -> Column:
    from vrl_spark.functions.formats import parse_xml

    return parse_xml(c)


FILTERS = {
    "integer": f_integer,
    "integerExt": f_integer_ext,
    "number": f_number,
    "numberExt": f_number_ext,
    "lowercase": f_lowercase,
    "uppercase": f_uppercase,
    "json": f_json,
    "boolean": f_boolean,
    "decodeuricomponent": f_decodeuricomponent,
    "keyvalue": f_keyvalue,
    "querystring": f_querystring,
    "rubyhash": f_rubyhash,
    "xml": f_xml,
}

PARAMETRIC = {
    "nullIf": f_null_if,
    "scale": f_scale,
    "date": f_date,
    "array": f_array,
}


def apply_filters(col: Column, chain: list) -> Column:
    """chain entries: 'name' or ('name', arg)."""
    out = col
    for entry in chain:
        if isinstance(entry, tuple):
            name, arg = entry
            out = PARAMETRIC[name](arg)(out)
        else:
            out = FILTERS[entry](out)
    return out

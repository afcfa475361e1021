"""Remaining format parsers: xml, yaml, ruby hash, regex_all,
replace_with, json-schema validation, compression stubs.

Availability-gated: yaml + jsonschema exist in this container and are
used; zstd/lz4/snappy/cbor do not — their functions raise
NotImplementedError at CALL time (plan-build time, not executor time)
with the exact pip name needed, keeping the API surface complete."""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------
# parse_regex_all (reference src/stdlib/parse_regex_all.rs)
# ---------------------------------------------------------------------


def parse_regex_all(col: Column, pattern: str) -> Column:
    """All matches -> array of structs of named captures.

    Vectorized pandas UDF (str.extractall); the JVM path
    (regexp_extract_all) only yields ONE group, so multi-group
    all-matches genuinely needs the Arrow lane."""
    import re as _re

    compiled = _re.compile(pattern)
    names = [n for n, _ in sorted(compiled.groupindex.items(), key=lambda kv: kv[1])]
    if not names:
        raise ValueError("parse_regex_all requires named capture groups")
    schema = T.ArrayType(
        T.StructType([T.StructField(n, T.StringType()) for n in names])
    )

    @pandas_udf(schema)
    def _all(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            out = []
            for m in compiled.finditer(v):
                out.append({n: m.group(n) for n in names})
            return out or None  # no match = error branch

        return s.map(one)

    return _all(col)


# ---------------------------------------------------------------------
# replace_with (closure over captures, src/stdlib/replace_with.rs)
# ---------------------------------------------------------------------


def replace_with(col: Column, pattern: str, fn: Callable[[dict], str]) -> Column:
    """Regex replace where the replacement is computed by a Python
    closure over the capture dict — VRL's only string closure. The
    closure runs inside an Arrow batch (once per match, C loop over
    rows)."""
    import re as _re

    compiled = _re.compile(pattern)

    @pandas_udf(T.StringType())
    def _rw(s: pd.Series) -> pd.Series:
        def repl(m: "._re.Match") -> str:
            groups = {"string": m.group(0)}
            groups.update(m.groupdict())
            for i, g in enumerate(m.groups(), start=1):
                groups[str(i)] = g
            return fn(groups)

        return s.map(lambda v: compiled.sub(repl, v) if v is not None else None)

    return _rw(col)


# ---------------------------------------------------------------------
# parse_xml (reference src/stdlib/parse_xml.rs) — stdlib ElementTree
# ---------------------------------------------------------------------


def parse_xml(col: Column) -> Column:
    """XML -> JSON string (dynamic shape; pair with from_json when the
    schema is known). Text nodes collapse per the reference's
    always_use_text_key=false behavior for leaf elements."""

    @pandas_udf(T.StringType())
    def _xml(s: pd.Series) -> pd.Series:
        import json
        import xml.etree.ElementTree as ET

        def node_to_obj(el):
            children = list(el)
            obj = {}
            for k, v in el.attrib.items():
                obj[f"@{k}"] = v
            if not children:
                text = (el.text or "").strip()
                if obj:
                    if text:
                        obj["#text"] = text
                    return obj
                return text
            for ch in children:
                val = node_to_obj(ch)
                if ch.tag in obj:
                    prev = obj[ch.tag]
                    if not isinstance(prev, list):
                        obj[ch.tag] = [prev]
                    obj[ch.tag].append(val)
                else:
                    obj[ch.tag] = val
            return obj

        def one(v):
            if v is None:
                return None
            try:
                root = ET.fromstring(v)
            except ET.ParseError:
                return None  # error branch
            return json.dumps({root.tag: node_to_obj(root)}, sort_keys=True)

        return s.map(one)

    return _xml(col)


# ---------------------------------------------------------------------
# parse_yaml (src/stdlib/parse_yaml.rs) — pyyaml present here
# ---------------------------------------------------------------------


def parse_yaml(col: Column) -> Column:
    """YAML -> JSON string (sorted keys: VRL objects are BTreeMaps)."""

    @pandas_udf(T.StringType())
    def _yaml(s: pd.Series) -> pd.Series:
        import json

        import yaml

        def one(v):
            if v is None:
                return None
            try:
                return json.dumps(yaml.safe_load(v), sort_keys=True)
            except yaml.YAMLError:
                return None

        return s.map(one)

    return _yaml(col)


# ---------------------------------------------------------------------
# parse_ruby_hash (src/stdlib/parse_ruby_hash.rs)
# ---------------------------------------------------------------------


def parse_ruby_hash(col: Column) -> Column:
    """Ruby hash literal -> JSON string. Handles '=>' arrows, symbol
    keys (:key / key:), nil, single quotes."""

    @pandas_udf(T.StringType())
    def _ruby(s: pd.Series) -> pd.Series:
        import json
        import re as _re

        sym = _re.compile(r"(?<=[{,\s]):(\w+)\s*=>")
        symtrail = _re.compile(r"(?<=[{,\s])(\w+):\s")
        arrow = _re.compile(r"=>")

        def one(v):
            if v is None:
                return None
            t = v
            t = sym.sub(r'"\1" =>', t)
            t = symtrail.sub(r'"\1": ', t)
            t = arrow.sub(":", t)
            t = t.replace("nil", "null")
            # single-quoted strings -> double-quoted
            t = _re.sub(r"'([^'\\]*(?:\\.[^'\\]*)*)'", lambda m: json.dumps(m.group(1)), t)
            try:
                return json.dumps(json.loads(t), sort_keys=True)
            except json.JSONDecodeError:
                return None

        return s.map(one)

    return _ruby(col)


# ---------------------------------------------------------------------
# validate_json_schema (src/stdlib/validate_json_schema.rs)
# ---------------------------------------------------------------------


def validate_json_schema(col: Column, schema_json: str) -> Column:
    """True iff the JSON document validates against the schema
    (jsonschema lib, compiled once per executor)."""

    @pandas_udf(T.BooleanType())
    def _val(s: pd.Series) -> pd.Series:
        import json

        import jsonschema

        validator = jsonschema.Draft7Validator(json.loads(schema_json))

        def one(v):
            if v is None:
                return None
            try:
                doc = json.loads(v)
            except json.JSONDecodeError:
                return False
            return validator.is_valid(doc)

        return s.map(one)

    return _val(col)


# ---------------------------------------------------------------------
# compression stubs for absent codecs (API-complete, fail at build)
# ---------------------------------------------------------------------


def _absent(fn_name: str, pip_name: str):
    def raiser(*_a, **_k):
        raise NotImplementedError(
            f"{fn_name}: codec library not available in this environment "
            f"(needs `pip install {pip_name}`); gzip/zlib variants in "
            "vrl_spark.functions.codec are available."
        )

    return raiser


encode_zstd = _absent("encode_zstd", "zstandard")
decode_zstd = _absent("decode_zstd", "zstandard")
encode_lz4 = _absent("encode_lz4", "lz4")
decode_lz4 = _absent("decode_lz4", "lz4")
encode_snappy = _absent("encode_snappy", "python-snappy")
decode_snappy = _absent("decode_snappy", "python-snappy")
parse_cbor = _absent("parse_cbor", "cbor2")

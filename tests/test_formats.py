"""formats module: regex_all, replace_with, xml/yaml/ruby-hash,
json-schema validation, absent-codec stubs."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vrl_spark.functions import formats as FM


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_parse_regex_all(spark):
    got = one(spark, FM.parse_regex_all(
        F.lit("a=1 b=2 c=3"), r"(?P<key>\w+)=(?P<val>\d+)"))
    assert [r.asDict() for r in got] == [
        {"key": "a", "val": "1"}, {"key": "b", "val": "2"}, {"key": "c", "val": "3"},
    ]
    assert one(spark, FM.parse_regex_all(F.lit("nothing"), r"(?P<d>\d+)")) is None


def test_replace_with(spark):
    # reference replace_with.rs example: upcase each match
    got = one(spark, FM.replace_with(
        F.lit("apples and bananas"), r"\b(?P<fruit>\w+)s\b",
        lambda g: g["fruit"].upper()))
    assert got == "APPLE and BANANA"


def test_parse_xml(spark):
    got = one(spark, FM.parse_xml(F.lit(
        '<book category="fiction"><title lang="en">X</title><page>1</page><page>2</page></book>'
    )))
    obj = json.loads(got)
    assert obj["book"]["@category"] == "fiction"
    assert obj["book"]["title"] == {"@lang": "en", "#text": "X"}
    assert obj["book"]["page"] == ["1", "2"]
    assert one(spark, FM.parse_xml(F.lit("<unclosed>"))) is None


def test_parse_yaml(spark):
    got = one(spark, FM.parse_yaml(F.lit("a: 1\nb:\n  - x\n  - y\n")))
    assert json.loads(got) == {"a": 1, "b": ["x", "y"]}
    assert one(spark, FM.parse_yaml(F.lit("{unclosed"))) is None


def test_parse_ruby_hash(spark):
    got = one(spark, FM.parse_ruby_hash(F.lit(
        '{ "test" => "value", "testNum" => 0.2, :sym => nil, "nested" => { "a" => 1 } }'
    )))
    assert json.loads(got) == {
        "test": "value", "testNum": 0.2, "sym": None, "nested": {"a": 1}}


def test_validate_json_schema(spark):
    schema = json.dumps({
        "type": "object",
        "properties": {"k": {"type": "integer"}},
        "required": ["k"],
    })
    df = spark.createDataFrame(
        [('{"k": 1}',), ('{"k": "no"}',), ("not json",), (None,)], ["s"]
    )
    got = [r["v"] for r in df.select(
        FM.validate_json_schema(F.col("s"), schema).alias("v")).collect()]
    assert got == [True, False, False, None]


def test_absent_codecs_raise_at_build(spark):
    with pytest.raises(NotImplementedError, match="zstandard"):
        FM.encode_zstd(F.lit("x"))
    with pytest.raises(NotImplementedError, match="cbor2"):
        FM.parse_cbor(F.lit("x"))


def test_seahash_reference_vectors(spark):
    from vrl_spark.functions.codec import seahash

    df = spark.createDataFrame([("foo",), ("bar",), ("",)], ["t"])
    got = {r["t"]: r["h"] for r in df.select(
        "t", seahash(F.col("t")).alias("h")).collect()}
    # reference seahash.rs test vectors
    assert got["foo"] == 4413582353838009230
    assert got["bar"] == -2796170501982571315
    # 33-byte input exercises the 32-byte block + tail path
    long = "x" * 33
    df2 = spark.createDataFrame([(long,)], ["t"])
    h = df2.select(seahash(F.col("t")).alias("h")).collect()[0]["h"]
    assert isinstance(h, int)

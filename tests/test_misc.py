"""Misc stdlib: ids, env, encode_csv, punycode, community_id,
unflatten, type predicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from vrl_spark.functions import misc as M


def one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0]["v"]


def test_deterministic_id_stable(spark):
    a = one(spark, M.deterministic_id(F.lit("x"), F.lit("y")))
    b = one(spark, M.deterministic_id(F.lit("x"), F.lit("y")))
    c = one(spark, M.deterministic_id(F.lit("x"), F.lit("z")))
    assert a == b != c
    import re

    assert re.match(r"^[0-9a-f]{8}-[0-9a-f]{4}-5[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}$", a)


def test_uuid_v4_shape(spark):
    import re

    v = one(spark, M.uuid_v4())
    assert re.match(r"^[0-9a-f-]{36}$", v)


def test_encode_csv(spark):
    got = one(spark, M.encode_csv(F.array(
        F.lit("plain"), F.lit("with,comma"), F.lit('say "hi"'), F.lit("x")
    )))
    assert got == 'plain,"with,comma","say ""hi""",x'


def test_punycode_roundtrip(spark):
    enc = one(spark, M.encode_punycode(F.lit("bücher.example")))
    assert enc == "xn--bcher-kva.example"
    dec = one(spark, M.decode_punycode(F.lit("xn--bcher-kva.example")))
    assert dec == "bücher.example"
    assert one(spark, M.encode_punycode(F.lit(None).cast("string"))) is None


def test_community_id_known_vector(spark):
    # Community ID spec reference vector (v1, seed 0, tcp):
    # 128.232.110.120:34855 -> 66.35.250.204:80 == 1:LQU9qZlK+B5F3KDmev6m5PMibrg=
    got = one(spark, M.community_id(
        F.lit("128.232.110.120"), F.lit("66.35.250.204"),
        F.lit(34855), F.lit(80), F.lit(6),
    ))
    assert got == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    # direction-invariant
    rev = one(spark, M.community_id(
        F.lit("66.35.250.204"), F.lit("128.232.110.120"),
        F.lit(80), F.lit(34855), F.lit(6),
    ))
    assert rev == got


def test_unflatten(spark):
    df = spark.range(1).select(
        F.create_map(
            F.lit("a.x"), F.lit("1"), F.lit("a.y"), F.lit("2"),
            F.lit("b"), F.lit("3"),
        ).alias("m")
    )
    got = df.select(M.unflatten_map(F.col("m")).alias("u")).collect()[0]["u"]
    assert got == {"a": {"x": "1", "y": "2"}, "b": {"": "3"}}


def test_env_and_predicates(spark):
    import os

    os.environ["VRL_SPARK_TEST_VAR"] = "hello"
    assert one(spark, M.get_env_var("VRL_SPARK_TEST_VAR")) == "hello"
    assert one(spark, M.get_env_var("NOPE_MISSING", "dflt")) == "dflt"
    assert one(spark, M.is_ipv6(F.lit("2001:db8::1"))) is True
    assert one(spark, M.is_ipv6(F.lit("1.2.3.4"))) is False
    from pyspark.sql import types as T

    assert M.type_def(T.StringType()) == "string"
    assert M.type_def(T.MapType(T.StringType(), T.StringType())) == "object"
    assert one(spark, M.is_integer(F.lit(5), T.LongType())) is True
    assert one(spark, M.is_integer(F.lit("5"), T.StringType())) is False


def test_seeded_randoms_deterministic(spark):
    df = spark.range(5)
    a = [r["r"] for r in df.select(M.random_int_seeded(0, 100).alias("r")).collect()]
    b = [r["r"] for r in df.select(M.random_int_seeded(0, 100).alias("r")).collect()]
    assert a == b
    assert all(0 <= v < 100 for v in a)


def test_ip_pton_ntop_subnet(spark):
    from vrl_spark.functions import math_ip as IP

    r = spark.range(1).select(
        IP.ip_ntop(IP.ip_pton(F.lit("1.2.3.4"))).alias("rt"),
        IP.ip_subnet(F.lit("192.168.10.32"), "/16").alias("s1"),
        IP.ip_subnet(F.lit("192.168.10.32"), "255.255.255.0").alias("s2"),
    ).collect()[0]
    assert r["rt"] == "1.2.3.4"
    assert r["s1"] == "192.168.0.0"
    assert r["s2"] == "192.168.10.0"


def test_uuid_v7_and_friendly(spark):
    import re

    ts = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    a = one(spark, M.uuid_v7(ts))
    b = one(spark, M.uuid_v7(ts))
    assert a == b  # deterministic for same ts
    assert re.match(r"^[0-9a-f]{8}-[0-9a-f]{4}-7[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}$", a)
    # friendly-id of uuid 00000000-...-0001 is '1'
    assert one(spark, M.uuid_from_friendly_id(F.lit("1"))) == (
        "00000000-0000-0000-0000-000000000001")


def test_split_path(spark):
    assert one(spark, M.split_path(F.lit("/a/b/c.txt"))) == ["a", "b", "c.txt"]


def test_wrapping_arithmetic_reference_semantics(spark):
    """arithmetic.rs:81-123 — i64 wrapping add/sub/mul, reference-exact
    two's-complement overflow (the ANSI-error default stays for
    pipelines that prefer loud failures)."""
    from vrl_spark.functions import math_ip as M

    MAX, MIN = 2**63 - 1, -(2**63)
    cases = [(MAX, 1), (MIN, -1), (MAX, MAX), (123, 456), (MIN, 2),
             (-7, 3), (2**40, 2**40), (0, 0)]
    df = spark.createDataFrame(cases, ["a", "b"])
    rows = df.select(
        "a", "b",
        M.vrl_add_wrapping(F.col("a"), F.col("b")).alias("add"),
        M.vrl_sub_wrapping(F.col("a"), F.col("b")).alias("sub"),
        M.vrl_mul_wrapping(F.col("a"), F.col("b")).alias("mul"),
    ).collect()

    def w(x):
        return (x + 2**63) % 2**64 - 2**63

    for r in rows:
        assert r["add"] == w(r["a"] + r["b"]), ("add", r["a"], r["b"])
        assert r["sub"] == w(r["a"] - r["b"]), ("sub", r["a"], r["b"])
        assert r["mul"] == w(r["a"] * r["b"]), ("mul", r["a"], r["b"])


def test_flatten_json_reference_examples(spark):
    """flatten.rs examples: nested arrays inline, nested objects join
    with the separator (custom separator supported), except keeps
    subtrees."""
    import json

    from vrl_spark.functions.collections import flatten_json

    rows = [
        (1, json.dumps([1, [2, 3, 4], [5, [6, 7], 8], 9])),
        (2, json.dumps({"parent1": {"child1": 1, "child2": 2},
                        "parent2": {"child3": 3}})),
        (3, json.dumps({"foo": {"bar": True}})),
        (4, json.dumps({"parent": {"child": 1}, "keep": {"nested": 2}})),
        (5, "not json {"),
    ]
    df = spark.createDataFrame(rows, ["i", "j"])
    got = {r["i"]: r for r in df.select(
        "i",
        flatten_json(F.col("j")).alias("dot"),
        flatten_json(F.col("j"), separator="_").alias("us"),
        flatten_json(F.col("j"), except_keys=["keep"]).alias("exc"),
    ).collect()}
    assert json.loads(got[1]["dot"]) == [1, 2, 3, 4, 5, 6, 7, 8, 9]
    assert json.loads(got[2]["dot"]) == {
        "parent1.child1": 1, "parent1.child2": 2, "parent2.child3": 3}
    assert json.loads(got[3]["us"]) == {"foo_bar": True}
    assert json.loads(got[4]["exc"]) == {"keep": {"nested": 2}, "parent.child": 1}
    assert got[5]["dot"] is None


def test_flatten_json_except_keys_nested(spark):
    """flatten.rs checks the except set at EVERY depth: an excepted
    nested object is kept verbatim under its prefixed key."""
    import json

    from vrl_spark.functions.collections import flatten_json

    doc = json.dumps({"parent": {"keep": {"n": 1}, "child": 2}, "keep": {"m": 3}})
    df = spark.createDataFrame([(doc,)], ["j"])
    out = df.select(
        flatten_json(F.col("j"), except_keys=["keep"]).alias("f")
    ).collect()[0]["f"]
    assert json.loads(out) == {
        "parent.keep": {"n": 1},  # nested except: subtree verbatim, prefixed
        "parent.child": 2,
        "keep": {"m": 3},
    }


def test_match_datadog_query_reference_examples(spark):
    """match_datadog_query.rs examples + wildcard/range/boolean/negation
    coverage of the public Datadog search syntax."""
    from vrl_spark.functions.ddquery import match_datadog_query as mdq

    df = spark.createDataFrame(
        [(1, "contains this and that", ["a:x", "b:y", "c:z"], "foobar", 7),
         (2, "contains only this", ["b:q"], "bazqux", 3)],
        ["i", "message", "tags", "name", "n"],
    )
    msg, tags = F.col("message"), F.col("tags")
    attrs = {"name": F.col("name"), "n": F.col("n")}
    rows = {r["i"]: r for r in df.select(
        "i",
        mdq("this OR that", message=msg).alias("q1"),
        mdq("this AND that", message=msg).alias("q2"),
        mdq("@name:foo*", attrs=attrs).alias("q3"),
        mdq('b:["x" TO "z"]', tags=tags).alias("q4"),
        mdq("b:y", tags=tags).alias("q5"),
        mdq("NOT that", message=msg).alias("q6"),
        mdq("-that this", message=msg).alias("q7"),
        mdq("(this AND that) OR @name:baz*", message=msg, attrs=attrs).alias("q8"),
        mdq("@n:>5", attrs=attrs).alias("q9"),
        mdq("@n:[1 TO 5]", attrs=attrs).alias("q10"),
        mdq('"only this"', message=msg).alias("q11"),
        mdq("@missing:x", attrs=attrs).alias("q12"),
    ).collect()}
    r1, r2 = rows[1], rows[2]
    assert r1["q1"] is True and r2["q1"] is True
    assert r1["q2"] is True and r2["q2"] is False       # reference ex. 1+2
    assert r1["q3"] is True and r2["q3"] is False       # reference ex. 3
    assert r1["q4"] is True and r2["q4"] is False       # reference ex. 4
    assert r1["q5"] is True and r2["q5"] is False
    assert r1["q6"] is False and r2["q6"] is True
    assert r1["q7"] is False and r2["q7"] is True
    assert r1["q8"] is True and r2["q8"] is True
    assert r1["q9"] is True and r2["q9"] is False
    assert r1["q10"] is False and r2["q10"] is True
    assert r1["q11"] is False and r2["q11"] is True
    assert r1["q12"] is False and r2["q12"] is False

    import pytest as _pt
    with _pt.raises(ValueError):
        mdq("(unbalanced", message=msg)


def test_match_datadog_query_numeric_range_on_string_column(spark):
    """Numeric range bounds compare numerically even on STRING-typed
    attribute columns (Datadog semantics) — lexicographic comparison
    would let '99' sneak into [100 TO 200] ('1' < '9' < '2' is false
    but '150' < '99' lexicographically)."""
    from vrl_spark.functions.ddquery import match_datadog_query as mdq

    df = spark.createDataFrame(
        [(1, "99"), (2, "150"), (3, "201"), (4, "100"), (5, "abc")],
        ["i", "code"],
    )
    attrs = {"code": F.col("code")}
    rows = {r["i"]: r["m"] for r in df.select(
        "i", mdq("@code:[100 TO 200]", attrs=attrs).alias("m")
    ).collect()}
    assert rows == {1: False, 2: True, 3: False, 4: True, 5: False}


def test_is_array_object_regex(spark):
    """is_array.rs / is_object.rs / is_regex.rs: static-schema dispatch
    plus the dynamic JSON-lane variants."""
    import re

    from pyspark.sql import types as T

    from vrl_spark.functions import misc

    df = spark.createDataFrame(
        [([1, 2], {"k": 1}, "x", '[1,2]', '{"a":1}'),
         (None, None, None, 'not json [', '12')],
        ["arr", "obj", "s", "ja", "jo"],
    )
    sch = {f.name: f.dataType for f in df.schema.fields}
    rows = df.select(
        misc.is_array(F.col("arr"), sch["arr"]).alias("a1"),
        misc.is_array(F.col("s"), sch["s"]).alias("a2"),
        misc.is_object(F.col("obj"), sch["obj"]).alias("o1"),
        misc.is_object(F.col("s"), sch["s"]).alias("o2"),
        misc.is_array_json(F.col("ja")).alias("ja"),
        misc.is_object_json(F.col("jo")).alias("jo"),
    ).collect()
    r0, r1 = rows
    assert r0["a1"] is True and r0["a2"] is False
    assert r0["o1"] is True and r0["o2"] is False
    assert r0["ja"] is True and r0["jo"] is True
    assert r1["a1"] is False and r1["o1"] is False  # null -> not array
    assert r1["ja"] is False and r1["jo"] is False

    assert misc.is_regex(re.compile("a+")) is True
    assert misc.is_regex("a+") is False
    assert misc.is_regex(123) is False
    # struct columns are objects too
    sdf = spark.createDataFrame([((1, "x"),)], "st struct<a:int,b:string>")
    st = sdf.schema["st"].dataType
    assert sdf.select(misc.is_object(F.col("st"), st).alias("x")).collect()[0]["x"] is True


def test_random_bytes(spark):
    """random_bytes.rs: requested length, 64k cap, negative rejection;
    seeded variant deterministic per seed."""
    import pytest as _pt

    from vrl_spark.functions import misc

    row = spark.range(3).select(
        F.length(misc.random_bytes(16)).alias("n16"),
        F.length(misc.random_bytes(33)).alias("n33"),
        misc.random_bytes(0).alias("z"),
        misc.random_bytes_seeded(8, seed=7).alias("s7a"),
        misc.random_bytes_seeded(8, seed=7).alias("s7b"),
        misc.random_bytes_seeded(8, seed=9).alias("s9"),
    ).collect()
    for r in row:
        assert r["n16"] == 16 and r["n33"] == 33
        assert bytes(r["z"]) == b""
        assert bytes(r["s7a"]) == bytes(r["s7b"])   # same seed: same bytes
        assert bytes(r["s7a"]) != bytes(r["s9"])    # different seed
    with _pt.raises(ValueError):
        misc.random_bytes(-1)
    with _pt.raises(ValueError):
        misc.random_bytes(64 * 1024 + 1)


def test_tag_types_externally_static(spark):
    """tag_types_externally.rs examples: nested scalars wrap in
    {"<type>": value}; objects/arrays keep shape; null stays null."""
    from pyspark.sql import types as T

    from vrl_spark.functions import misc

    df = spark.createDataFrame(
        [
            (123, "Hello world", 67.9, True,
             ["foo", "bar"], {"k": 5}, ("inner", None)),
            (None, None, None, None, None, None, (None, 2.5)),
        ],
        "i bigint, s string, f double, b boolean, arr array<string>, "
        "m map<string,bigint>, st struct<a:string,d:double>",
    )
    out = df.select(
        *[
            misc.tag_types_externally(F.col(c), df.schema[c].dataType)
            .alias(c)
            for c in df.columns
        ]
    )
    # output schema is the tagged shape, statically
    assert (
        out.schema["st"].dataType.simpleString()
        == "struct<a:struct<string:string>,d:struct<float:double>>"
    )
    r0, r1 = out.orderBy(F.col("i").asc_nulls_last()).collect()
    assert r0["i"].asDict() == {"integer": 123}
    assert r0["s"].asDict() == {"string": "Hello world"}
    assert r0["f"].asDict() == {"float": 67.9}
    assert r0["b"].asDict() == {"boolean": True}
    assert [x.asDict() for x in r0["arr"]] == [
        {"string": "foo"}, {"string": "bar"}
    ]
    assert r0["m"]["k"].asDict() == {"integer": 5}
    assert r0["st"]["a"].asDict() == {"string": "inner"}
    assert r0["st"]["d"] is None          # null scalar stays null
    assert r1["i"] is None and r1["arr"] is None and r1["m"] is None
    assert r1["st"]["a"] is None
    assert r1["st"]["d"].asDict() == {"float": 2.5}
    # a NULL struct column stays null (VRL Null), never a struct of
    # tagged nulls
    ndf = spark.createDataFrame(
        [(None,)], "st struct<a:string,d:double>"
    )
    nr = ndf.select(
        misc.tag_types_externally(
            F.col("st"), ndf.schema["st"].dataType
        ).alias("st")
    ).collect()[0]
    assert nr["st"] is None
    # unsupported scalar (binary) rejects loudly
    import pytest as _pt

    with _pt.raises(ValueError):
        misc.tag_types_externally(F.col("x"), T.BinaryType())


def test_tag_types_externally_json(spark):
    """Dynamic lane over JSON strings (reference examples verbatim)."""
    from vrl_spark.functions import misc

    rows = [
        ('123', '{"integer":123}'),
        ('{"message":"Hello world","request":{"duration_ms":67.9}}',
         '{"message":{"string":"Hello world"},'
         '"request":{"duration_ms":{"float":67.9}}}'),
        ('["foo","bar"]', '[{"string":"foo"},{"string":"bar"}]'),
        ('null', 'null'),
        ('true', '{"boolean":true}'),
        ('not json', None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(rows)], "i int, j string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", misc.tag_types_externally_json(F.col("j")).alias("t")
        ).collect()
    }
    for i, (_, want) in enumerate(rows):
        assert got[i] == want, (i, got[i], want)

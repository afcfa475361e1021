"""Protobuf codec tests, fully self-contained: the test builds its
own compiled descriptor set by encoding google.protobuf's
FileDescriptorSet (whose schema is public and written out literally
below) through the module's encoder — bootstrapping exactly the way
protoc output is structured. Wire bytes for the classic examples
(field 1 varint 150 -> 08 96 01; packed [3,270,86942]) are asserted
against the well-known public byte sequences."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vrl_spark.functions import formats as FM
from vrl_spark.functions.proto import (
    ProtoError,
    decode_message,
    encode_message,
    load_descriptor,
    resolve_message,
)

# descriptor.proto subset, as a literal registry (public schema)
_L_REP = 3


def _f(name, number, ftype, type_name="", label=1):
    return {"name": name, "number": number, "label": label,
            "type": ftype, "type_name": type_name}


_MSG = 11
_DESC_REGISTRY = {
    ".g.FileDescriptorSet": {
        "name": "FileDescriptorSet", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [_f("file", 1, _MSG, ".g.FileDescriptorProto", _L_REP)],
    },
    ".g.FileDescriptorProto": {
        "name": "FileDescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [
            _f("name", 1, 9), _f("package", 2, 9),
            _f("message_type", 4, _MSG, ".g.DescriptorProto", _L_REP),
            _f("enum_type", 5, _MSG, ".g.EnumDescriptorProto", _L_REP),
        ],
    },
    ".g.DescriptorProto": {
        "name": "DescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [
            _f("name", 1, 9),
            _f("field", 2, _MSG, ".g.FieldDescriptorProto", _L_REP),
            _f("nested_type", 3, _MSG, ".g.DescriptorProto", _L_REP),
            _f("enum_type", 4, _MSG, ".g.EnumDescriptorProto", _L_REP),
            _f("options", 7, _MSG, ".g.MessageOptions"),
        ],
    },
    ".g.MessageOptions": {
        "name": "MessageOptions", "map_entry": False, "nested": [],
        "enums": [], "fields": [_f("map_entry", 7, 8)],
    },
    ".g.FieldDescriptorProto": {
        "name": "FieldDescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [
            _f("name", 1, 9), _f("number", 3, 5), _f("label", 4, 5),
            _f("type", 5, 5), _f("type_name", 6, 9),
        ],
    },
    ".g.EnumDescriptorProto": {
        "name": "EnumDescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [_f("name", 1, 9),
                   _f("value", 2, _MSG, ".g.EnumValueDescriptorProto",
                      _L_REP)],
    },
    ".g.EnumValueDescriptorProto": {
        "name": "EnumValueDescriptorProto", "map_entry": False,
        "nested": [], "enums": [],
        "fields": [_f("name", 1, 9), _f("number", 2, 5)],
    },
}


def _field(name, number, ftype, type_name="", label=1):
    d = {"name": name, "number": number, "type": ftype}
    if label != 1:
        d["label"] = label
    if type_name:
        d["type_name"] = type_name
    return d


def _build_desc_bytes():
    """Encode a FileDescriptorSet for package `t` with message All
    (every scalar type, enum, nested, repeated, two maps)."""
    def map_entry(name, kf, vf):
        return {"name": name, "field": [kf, vf],
                "options": {"map_entry": True}}

    all_msg = {
        "name": "All",
        "field": [
            _field("d", 1, 1), _field("fl", 2, 2),
            _field("i32", 3, 5), _field("i64", 4, 3),
            _field("u32", 5, 13), _field("u64", 6, 4),
            _field("s32", 7, 17), _field("s64", 8, 18),
            _field("fx32", 9, 7), _field("fx64", 10, 6),
            _field("sf32", 11, 15), _field("sf64", 12, 16),
            _field("b", 13, 8), _field("s", 14, 9), _field("by", 15, 12),
            _field("color", 16, 14, ".t.Color"),
            _field("sub", 17, 11, ".t.All.Sub"),
            _field("nums", 18, 5, label=3),
            _field("subs", 19, 11, ".t.All.Sub", label=3),
            _field("m_si", 20, 11, ".t.All.MSiEntry", label=3),
            _field("m_is", 21, 11, ".t.All.MIsEntry", label=3),
        ],
        "nested_type": [
            {"name": "Sub", "field": [_field("x", 1, 5)]},
            map_entry("MSiEntry", _field("key", 1, 9),
                      _field("value", 2, 3)),
            map_entry("MIsEntry", _field("key", 1, 5),
                      _field("value", 2, 9)),
        ],
    }
    color = {"name": "Color",
             "value": [{"name": "COLOR_UNSET", "number": 0},
                       {"name": "COLOR_RED", "number": 1},
                       {"name": "COLOR_BLUE", "number": 2}]}
    fds = {"file": [{"name": "t.proto", "package": "t",
                     "message_type": [all_msg], "enum_type": [color]}]}
    return encode_message(fds, _DESC_REGISTRY[".g.FileDescriptorSet"],
                          _DESC_REGISTRY)


DESC = _build_desc_bytes()


def test_descriptor_bootstrap_roundtrip():
    reg = load_descriptor(DESC)
    assert sorted(reg) == [
        ".t.All", ".t.All.MIsEntry", ".t.All.MSiEntry", ".t.All.Sub",
        ".t.Color",
    ]
    assert reg[".t.All.MSiEntry"]["map_entry"]
    assert reg[".t.Color"]["values"] == {
        0: "COLOR_UNSET", 1: "COLOR_RED", 2: "COLOR_BLUE"}
    with pytest.raises(ProtoError):
        resolve_message(reg, "t.Missing")


def test_classic_wire_vectors():
    """The protobuf docs' canonical examples: field 1 varint 150
    encodes as 08 96 01; packed varints [3, 270, 86942] decode from
    the documented byte run."""
    reg = load_descriptor(DESC)
    msg = resolve_message(reg, "t.All")
    assert encode_message({"i32": 150}, msg, reg) == b"\x18\x96\x01"
    # (field 3 here, so key = 3<<3 | 0 = 0x18 instead of the docs' 08)
    packed = b"\x92\x01\x06\x03\x8e\x02\x9e\xa7\x05"  # field 18, wt 2
    assert decode_message(packed, msg, reg) == {"nums": [3, 270, 86942]}


def test_all_scalar_types_roundtrip():
    reg = load_descriptor(DESC)
    msg = resolve_message(reg, "t.All")
    obj = {
        "d": 1.5, "fl": -0.25, "i32": -42, "i64": -(1 << 40),
        "u32": 4000000000, "u64": (1 << 63) + 5, "s32": -7, "s64": -99,
        "fx32": 123456, "fx64": 1 << 50, "sf32": -2000000,
        "sf64": -(1 << 45), "b": True, "s": "héllo", "by": "\x00\x01\xff",
        "color": "COLOR_BLUE", "sub": {"x": 9},
        "nums": [1, 2, 3], "subs": [{"x": 1}, {"x": 2}],
        "m_si": {"a": 10, "b": -20}, "m_is": {"5": "five", "-3": "neg"},
    }
    enc = encode_message(obj, msg, reg)
    assert decode_message(enc, msg, reg) == obj
    # negative int32 goes out as the 10-byte sign-extended varint
    assert len(encode_message({"i32": -1}, msg, reg)) == 11
    # sint32 zigzags: -1 -> 1 single byte
    assert encode_message({"s32": -1}, msg, reg) == b"\x38\x01"
    # enum by number also accepted on encode, decoded back to name
    assert decode_message(
        encode_message({"color": 1}, msg, reg), msg, reg
    ) == {"color": "COLOR_RED"}


def test_enum_and_malformed_errors():
    reg = load_descriptor(DESC)
    msg = resolve_message(reg, "t.All")
    with pytest.raises(ProtoError, match="cannot be in"):
        decode_message(b"\x80\x01\x07", msg, reg)  # color = 7: no name
    with pytest.raises(ProtoError):
        decode_message(b"\x18\x96", msg, reg)  # truncated varint
    with pytest.raises(ProtoError, match="not in enum"):
        encode_message({"color": "COLOR_GREEN"}, msg, reg)
    # unknown fields are skipped, like prost
    assert decode_message(b"\xf8\x7f\x01\x18\x05", msg, reg) == {"i32": 5}


def test_parse_and_encode_proto_spark_path(spark):
    reg = load_descriptor(DESC)
    msg = resolve_message(reg, "t.All")
    payload = encode_message(
        {"s": "someone", "subs": [{"x": 6}], "color": "COLOR_RED"},
        msg, reg)
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"\xff\xff\xff")),
         (3, None)],
        "i int, c binary",
    )
    got = {r["i"]: r["p"] for r in df.select(
        "i", FM.parse_proto(F.col("c"), DESC, "t.All").alias("p")
    ).collect()}
    assert json.loads(got[1]) == {
        "s": "someone", "subs": [{"x": 6}], "color": "COLOR_RED"}
    assert got[2] is None and got[3] is None
    # encode_proto: JSON column -> bytes, decodable again
    j = spark.createDataFrame(
        [('{"s":"x","m_si":{"k":7}}',), ("not json",)], ["t"])
    out = j.select(
        FM.parse_proto(
            FM.encode_proto(F.col("t"), DESC, "t.All"), DESC, "t.All"
        ).alias("p")).collect()
    assert json.loads(out[0]["p"]) == {"s": "x", "m_si": {"k": 7}}
    assert out[1]["p"] is None
    # bad message type fails at PLAN build, not in a task
    with pytest.raises(ProtoError):
        FM.parse_proto(F.col("t"), DESC, "t.Nope")


def test_singular_message_field_merge_semantics():
    """Repeated wire occurrences of a SINGULAR message field merge
    (spec/prost behavior): nested singulars recurse, repeated fields
    concatenate, scalars take the last occurrence."""
    reg = load_descriptor(DESC)
    msg = resolve_message(reg, "t.All")
    # two fragments of field 17 (sub): {x: 1} then {x: 2}
    frag1 = encode_message({"sub": {"x": 1}}, msg, reg)
    frag2 = encode_message({"sub": {"x": 2}}, msg, reg)
    assert decode_message(frag1 + frag2, msg, reg) == {"sub": {"x": 2}}
    # repeated field inside the merged message concatenates at the
    # top level too: nums split across two fragments
    a = encode_message({"nums": [1, 2]}, msg, reg)
    b = encode_message({"nums": [3]}, msg, reg)
    assert decode_message(a + b, msg, reg) == {"nums": [1, 2, 3]}


def test_truncated_packed_fixed_raises():
    """A packed fixed64/fixed32 payload whose length is not a multiple
    of the element width must raise ProtoError, never silently decode
    a short-read value (the packed-varint path already raised)."""
    reg = {
        ".t.P": {
            "name": "P", "map_entry": False, "nested": [], "enums": [],
            "fields": [_f("pf64", 1, 6, label=3),
                       _f("pf32", 2, 7, label=3)],
        },
    }
    msg = reg[".t.P"]
    # field 1, wire type 2 (packed), 4-byte payload: half a fixed64
    with pytest.raises(ProtoError, match="truncated packed fixed64"):
        decode_message(b"\x0a\x04AAAA", msg, reg)
    # field 2, packed, 6 bytes: one fixed32 then a 2-byte remnant
    with pytest.raises(ProtoError, match="truncated packed fixed32"):
        decode_message(b"\x12\x06AAAABB", msg, reg)
    # well-formed packed runs still decode
    ok = decode_message(
        b"\x0a\x08" + (5).to_bytes(8, "little")
        + b"\x12\x04" + (9).to_bytes(4, "little"), msg, reg)
    assert ok == {"pf64": [5], "pf32": [9]}

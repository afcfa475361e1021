"""From-scratch Protocol Buffers codec (reference parity:
src/stdlib/parse_proto.rs, encode_proto.rs, src/protobuf/parse.rs
proto_to_value + encode.rs value->proto).

No protobuf library: the wire format (varint / fixed / length-
delimited) is public and tiny, and the compiled descriptor file the
reference takes as its ``desc_file`` argument is ITSELF a protobuf
message (google.protobuf.FileDescriptorSet) with a well-known public
schema — so the descriptor set is parsed with the same wire reader,
bootstrapping full dynamic-message support: all scalar types
(including zigzag sints and fixed widths), nested messages, enums
(decoded to their NAMES, as the reference does), repeated fields
(packed and unpacked), and map fields (keys stringified, as the
reference does for VRL object keys).

Divergence, documented: proto3 implicit presence — the reference's
has_field() hides scalar fields explicitly encoded with their default
value; this decoder emits every field present on the wire (proto3
serializers omit defaults, so the difference only shows on hand-
crafted input).

Values cross the parse boundary as JSON text with sorted keys (the
repo's convention for object-returning parsers — see parse_cbor);
bytes fields are latin-1-mapped strings, like parse_cbor's byte
strings.
"""

from __future__ import annotations

import struct

# FieldDescriptorProto.Type numbers (descriptor.proto, public)
_T_DOUBLE, _T_FLOAT, _T_INT64, _T_UINT64, _T_INT32 = 1, 2, 3, 4, 5
_T_FIXED64, _T_FIXED32, _T_BOOL, _T_STRING, _T_GROUP = 6, 7, 8, 9, 10
_T_MESSAGE, _T_BYTES, _T_UINT32, _T_ENUM = 11, 12, 13, 14
_T_SFIXED32, _T_SFIXED64, _T_SINT32, _T_SINT64 = 15, 16, 17, 18

_VARINT_TYPES = {_T_INT64, _T_UINT64, _T_INT32, _T_BOOL, _T_UINT32,
                 _T_ENUM, _T_SINT32, _T_SINT64}
_FIXED64_TYPES = {_T_DOUBLE, _T_FIXED64, _T_SFIXED64}
_FIXED32_TYPES = {_T_FLOAT, _T_FIXED32, _T_SFIXED32}

_LABEL_REPEATED = 3


class ProtoError(ValueError):
    pass


# ---------------------------------------------------------------------
# wire primitives
# ---------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data) or shift > 63:
            raise ProtoError("truncated/overlong varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7


def _write_varint(out: bytearray, v: int):
    v &= 0xFFFFFFFFFFFFFFFF
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _zigzag_dec(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _zigzag_enc(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _iter_fields(data: bytes):
    """Yield (field_number, wire_type, payload) over a message body.
    wire payloads: varint int, fixed int, or bytes for type 2."""
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = _read_varint(data, pos)
        fnum, wt = key >> 3, key & 7
        if fnum == 0:
            raise ProtoError("field number 0")
        if wt == 0:
            v, pos = _read_varint(data, pos)
            yield fnum, wt, v
        elif wt == 1:
            if pos + 8 > n:
                raise ProtoError("truncated fixed64")
            yield fnum, wt, int.from_bytes(data[pos : pos + 8], "little")
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > n:
                raise ProtoError("truncated length-delimited field")
            yield fnum, wt, data[pos : pos + ln]
            pos += ln
        elif wt == 5:
            if pos + 4 > n:
                raise ProtoError("truncated fixed32")
            yield fnum, wt, int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        else:
            raise ProtoError(f"unsupported wire type {wt}")


# ---------------------------------------------------------------------
# descriptor set parsing (bootstrap: descriptor.proto via the wire
# reader itself)
# ---------------------------------------------------------------------


def _parse_enum_desc(data: bytes) -> dict:
    name, values = "", {}
    for fnum, _wt, v in _iter_fields(data):
        if fnum == 1:
            name = v.decode()
        elif fnum == 2:  # EnumValueDescriptorProto
            vn, vnum = "", 0
            for f2, _w2, v2 in _iter_fields(v):
                if f2 == 1:
                    vn = v2.decode()
                elif f2 == 2:
                    vnum = _signed64(v2)
            values[vnum] = vn
    return {"name": name, "values": values,
            "names": {n: num for num, n in values.items()}}


def _parse_field_desc(data: bytes) -> dict:
    f = {"name": "", "number": 0, "label": 1, "type": 0, "type_name": ""}
    for fnum, _wt, v in _iter_fields(data):
        if fnum == 1:
            f["name"] = v.decode()
        elif fnum == 3:
            f["number"] = _signed64(v)
        elif fnum == 4:
            f["label"] = v
        elif fnum == 5:
            f["type"] = v
        elif fnum == 6:
            f["type_name"] = v.decode()
    return f


def _parse_message_desc(data: bytes) -> dict:
    m = {"name": "", "fields": [], "nested": [], "enums": [],
         "map_entry": False}
    for fnum, _wt, v in _iter_fields(data):
        if fnum == 1:
            m["name"] = v.decode()
        elif fnum == 2:
            m["fields"].append(_parse_field_desc(v))
        elif fnum == 3:
            m["nested"].append(_parse_message_desc(v))
        elif fnum == 4:
            m["enums"].append(_parse_enum_desc(v))
        elif fnum == 7:  # MessageOptions
            for f2, _w2, v2 in _iter_fields(v):
                if f2 == 7:  # map_entry
                    m["map_entry"] = bool(v2)
    return m


def parse_descriptor_set(data: bytes) -> dict:
    """FileDescriptorSet bytes -> registry mapping fully-qualified
    names ('.pkg.Msg', '.pkg.Msg.Nested', '.pkg.Enum') to parsed
    message/enum descriptors."""
    registry: dict[str, dict] = {}

    def add_message(prefix: str, m: dict):
        fq = f"{prefix}.{m['name']}"
        registry[fq] = m
        for e in m["enums"]:
            registry[f"{fq}.{e['name']}"] = e
        for nm in m["nested"]:
            add_message(fq, nm)

    for fnum, _wt, v in _iter_fields(data):
        if fnum != 1:  # FileDescriptorProto
            continue
        pkg = ""
        messages, enums = [], []
        for f2, _w2, v2 in _iter_fields(v):
            if f2 == 2:
                pkg = v2.decode()
            elif f2 == 4:
                messages.append(_parse_message_desc(v2))
            elif f2 == 5:
                enums.append(_parse_enum_desc(v2))
        prefix = f".{pkg}" if pkg else ""
        for e in enums:
            registry[f"{prefix}.{e['name']}"] = e
        for m in messages:
            add_message(prefix, m)
    if not registry:
        raise ProtoError("no descriptors found in descriptor set")
    return registry


# ---------------------------------------------------------------------
# dynamic message decode (proto -> python object)
# ---------------------------------------------------------------------


def _scalar_from_wire(ftype: int, wt: int, payload, registry, type_name):
    if ftype in _VARINT_TYPES:
        if wt != 0:
            raise ProtoError("wire type mismatch for varint field")
        if ftype in (_T_INT32, _T_INT64):
            return _signed64(payload)
        if ftype in (_T_SINT32, _T_SINT64):
            return _zigzag_dec(payload)
        if ftype == _T_BOOL:
            return bool(payload)
        if ftype == _T_ENUM:
            enum = registry.get(type_name)
            if enum is None:
                raise ProtoError(f"unknown enum {type_name}")
            name = enum["values"].get(_signed64(payload))
            if name is None:
                raise ProtoError(
                    f"The number {_signed64(payload)} cannot be in "
                    f"'{enum['name']}'"
                )
            return name
        return payload  # uint32/uint64
    if ftype in _FIXED64_TYPES:
        if wt != 1:
            raise ProtoError("wire type mismatch for fixed64 field")
        if ftype == _T_DOUBLE:
            return struct.unpack("<d", payload.to_bytes(8, "little"))[0]
        if ftype == _T_SFIXED64:
            return _signed64(payload)
        return payload
    if ftype in _FIXED32_TYPES:
        if wt != 5:
            raise ProtoError("wire type mismatch for fixed32 field")
        if ftype == _T_FLOAT:
            return struct.unpack("<f", payload.to_bytes(4, "little"))[0]
        if ftype == _T_SFIXED32:
            v = payload
            return v - (1 << 32) if v >= (1 << 31) else v
        return payload
    if ftype == _T_STRING:
        return payload.decode("utf-8")
    if ftype == _T_BYTES:
        return payload.decode("latin-1")
    raise ProtoError(f"unsupported field type {ftype}")


def decode_message(data: bytes, msg: dict, registry: dict) -> dict:
    by_num = {f["number"]: f for f in msg["fields"]}
    out: dict = {}
    for fnum, wt, payload in _iter_fields(data):
        f = by_num.get(fnum)
        if f is None:
            continue  # unknown fields are skipped, like prost
        ftype, name = f["type"], f["name"]
        repeated = f["label"] == _LABEL_REPEATED
        if ftype == _T_MESSAGE:
            sub = registry.get(f["type_name"])
            if sub is None:
                raise ProtoError(f"unknown message {f['type_name']}")
            if wt != 2:
                raise ProtoError("message field must be length-delimited")
            if sub.get("map_entry"):
                kf = next(x for x in sub["fields"] if x["number"] == 1)
                vf = next(x for x in sub["fields"] if x["number"] == 2)
                entry = decode_message(payload, sub, registry)
                key = entry.get(kf["name"], _default_value(kf, registry))
                val = entry.get(vf["name"], _default_value(vf, registry))
                if isinstance(key, bool):
                    key = "true" if key else "false"
                out.setdefault(name, {})[str(key)] = val
                continue
            item = decode_message(payload, sub, registry)
            if repeated:
                out.setdefault(name, []).append(item)
            elif name in out:
                # spec: repeated occurrences of a singular message
                # field MERGE (nested singulars recurse, repeated
                # fields concatenate, scalars take the last value)
                out[name] = _merge_messages(out[name], item)
            else:
                out[name] = item
            continue
        if repeated:
            if wt == 2 and ftype not in (_T_STRING, _T_BYTES):
                # packed scalars: parse the payload as a run
                items = out.setdefault(name, [])
                pos = 0
                while pos < len(payload):
                    if ftype in _VARINT_TYPES:
                        raw, pos = _read_varint(payload, pos)
                        items.append(_scalar_from_wire(
                            ftype, 0, raw, registry, f["type_name"]))
                    elif ftype in _FIXED64_TYPES:
                        if pos + 8 > len(payload):
                            raise ProtoError("truncated packed fixed64")
                        raw = int.from_bytes(payload[pos : pos + 8], "little")
                        pos += 8
                        items.append(_scalar_from_wire(
                            ftype, 1, raw, registry, f["type_name"]))
                    else:
                        if pos + 4 > len(payload):
                            raise ProtoError("truncated packed fixed32")
                        raw = int.from_bytes(payload[pos : pos + 4], "little")
                        pos += 4
                        items.append(_scalar_from_wire(
                            ftype, 5, raw, registry, f["type_name"]))
            else:
                out.setdefault(name, []).append(_scalar_from_wire(
                    ftype, wt, payload, registry, f["type_name"]))
        else:
            out[name] = _scalar_from_wire(
                ftype, wt, payload, registry, f["type_name"])
    return out


def _merge_messages(a: dict, b: dict) -> dict:
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge_messages(out[k], v)
        elif k in out and isinstance(out[k], list) and isinstance(v, list):
            out[k] = out[k] + v
        else:
            out[k] = v
    return out


def _default_value(f: dict, registry: dict):
    ftype = f["type"]
    if ftype == _T_STRING:
        return ""
    if ftype == _T_BYTES:
        return ""
    if ftype == _T_BOOL:
        return False
    if ftype in (_T_DOUBLE, _T_FLOAT):
        return 0.0
    if ftype == _T_ENUM:
        enum = registry.get(f["type_name"], {"values": {}})
        return enum["values"].get(0, 0)
    if ftype == _T_MESSAGE:
        return {}
    return 0


# ---------------------------------------------------------------------
# dynamic message encode (python object -> proto)
# ---------------------------------------------------------------------


def _scalar_to_wire(out: bytearray, fnum: int, ftype: int, v,
                    registry, type_name):
    if ftype in _VARINT_TYPES:
        _write_varint(out, fnum << 3 | 0)
        if ftype == _T_BOOL:
            _write_varint(out, 1 if v else 0)
        elif ftype in (_T_SINT32, _T_SINT64):
            _write_varint(out, _zigzag_enc(int(v)))
        elif ftype == _T_ENUM:
            enum = registry.get(type_name)
            if enum is None:
                raise ProtoError(f"unknown enum {type_name}")
            if isinstance(v, str):
                if v not in enum["names"]:
                    raise ProtoError(f"'{v}' not in enum {enum['name']}")
                v = enum["names"][v]
            _write_varint(out, int(v))
        else:
            _write_varint(out, int(v))
    elif ftype in _FIXED64_TYPES:
        _write_varint(out, fnum << 3 | 1)
        if ftype == _T_DOUBLE:
            out += struct.pack("<d", float(v))
        else:
            out += (int(v) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
    elif ftype in _FIXED32_TYPES:
        _write_varint(out, fnum << 3 | 5)
        if ftype == _T_FLOAT:
            out += struct.pack("<f", float(v))
        else:
            out += (int(v) & 0xFFFFFFFF).to_bytes(4, "little")
    elif ftype == _T_STRING:
        b = str(v).encode("utf-8")
        _write_varint(out, fnum << 3 | 2)
        _write_varint(out, len(b))
        out += b
    elif ftype == _T_BYTES:
        b = v if isinstance(v, (bytes, bytearray)) else str(v).encode("latin-1")
        _write_varint(out, fnum << 3 | 2)
        _write_varint(out, len(b))
        out += bytes(b)
    else:
        raise ProtoError(f"unsupported field type {ftype}")


def _map_key_from_str(kf: dict, s: str):
    if kf["type"] == _T_STRING:
        return s
    if kf["type"] == _T_BOOL:
        return s == "true"
    return int(s)


def encode_message(obj: dict, msg: dict, registry: dict) -> bytes:
    if not isinstance(obj, dict):
        raise ProtoError("message value must be an object")
    out = bytearray()
    for f in sorted(msg["fields"], key=lambda x: x["number"]):
        name = f["name"]
        if name not in obj or obj[name] is None:
            continue
        v = obj[name]
        fnum, ftype = f["number"], f["type"]
        sub = registry.get(f["type_name"]) if ftype == _T_MESSAGE else None
        if sub is not None and sub.get("map_entry"):
            kf = next(x for x in sub["fields"] if x["number"] == 1)
            vf = next(x for x in sub["fields"] if x["number"] == 2)
            for ks in sorted(v):
                entry = encode_message(
                    {kf["name"]: _map_key_from_str(kf, ks),
                     vf["name"]: v[ks]}, sub, registry)
                _write_varint(out, fnum << 3 | 2)
                _write_varint(out, len(entry))
                out += entry
            continue
        items = v if f["label"] == _LABEL_REPEATED else [v]
        if f["label"] == _LABEL_REPEATED and not isinstance(v, list):
            raise ProtoError(f"field {name} must be an array")
        for item in items:
            if ftype == _T_MESSAGE:
                body = encode_message(item, sub, registry)
                _write_varint(out, fnum << 3 | 2)
                _write_varint(out, len(body))
                out += body
            else:
                _scalar_to_wire(out, fnum, ftype, item, registry,
                                f["type_name"])
    return bytes(out)


# ---------------------------------------------------------------------
# public entry points (mirroring the reference argument shapes)
# ---------------------------------------------------------------------


def load_descriptor(desc: bytes | str) -> dict:
    """Registry from descriptor-set bytes or a .desc file path."""
    if isinstance(desc, str):
        with open(desc, "rb") as fh:
            desc = fh.read()
    return parse_descriptor_set(desc)


def resolve_message(registry: dict, message_type: str) -> dict:
    """'pkg.Message' (as the reference takes it) -> descriptor."""
    fq = message_type if message_type.startswith(".") else f".{message_type}"
    msg = registry.get(fq)
    if msg is None or "fields" not in msg:
        raise ProtoError(f"message type {message_type} not found")
    return msg


# ---------------------------------------------------------------------
# descriptor-set construction (no protoc needed): the descriptor
# schema below is the same public descriptor.proto subset the parser
# reads, expressed as a ready-made registry for encode_message
# ---------------------------------------------------------------------

def _d_field(name, number, ftype, type_name="", label=1):
    return {"name": name, "number": number, "label": label,
            "type": ftype, "type_name": type_name}


_DESCRIPTOR_REGISTRY = {
    ".g.FileDescriptorSet": {
        "name": "FileDescriptorSet", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [_d_field("file", 1, _T_MESSAGE,
                            ".g.FileDescriptorProto", _LABEL_REPEATED)],
    },
    ".g.FileDescriptorProto": {
        "name": "FileDescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [
            _d_field("name", 1, _T_STRING),
            _d_field("package", 2, _T_STRING),
            _d_field("message_type", 4, _T_MESSAGE, ".g.DescriptorProto",
                     _LABEL_REPEATED),
            _d_field("enum_type", 5, _T_MESSAGE, ".g.EnumDescriptorProto",
                     _LABEL_REPEATED),
        ],
    },
    ".g.DescriptorProto": {
        "name": "DescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [
            _d_field("name", 1, _T_STRING),
            _d_field("field", 2, _T_MESSAGE, ".g.FieldDescriptorProto",
                     _LABEL_REPEATED),
            _d_field("nested_type", 3, _T_MESSAGE, ".g.DescriptorProto",
                     _LABEL_REPEATED),
            _d_field("enum_type", 4, _T_MESSAGE, ".g.EnumDescriptorProto",
                     _LABEL_REPEATED),
            _d_field("options", 7, _T_MESSAGE, ".g.MessageOptions"),
        ],
    },
    ".g.MessageOptions": {
        "name": "MessageOptions", "map_entry": False, "nested": [],
        "enums": [], "fields": [_d_field("map_entry", 7, _T_BOOL)],
    },
    ".g.FieldDescriptorProto": {
        "name": "FieldDescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [
            _d_field("name", 1, _T_STRING),
            _d_field("number", 3, _T_INT32),
            _d_field("label", 4, _T_INT32),
            _d_field("type", 5, _T_INT32),
            _d_field("type_name", 6, _T_STRING),
        ],
    },
    ".g.EnumDescriptorProto": {
        "name": "EnumDescriptorProto", "map_entry": False, "nested": [],
        "enums": [],
        "fields": [_d_field("name", 1, _T_STRING),
                   _d_field("value", 2, _T_MESSAGE,
                            ".g.EnumValueDescriptorProto",
                            _LABEL_REPEATED)],
    },
    ".g.EnumValueDescriptorProto": {
        "name": "EnumValueDescriptorProto", "map_entry": False,
        "nested": [], "enums": [],
        "fields": [_d_field("name", 1, _T_STRING),
                   _d_field("number", 2, _T_INT32)],
    },
}


def build_descriptor_set(files: list[dict]) -> bytes:
    """Encode FileDescriptorProto-shaped dicts ({name, package,
    message_type: [...], enum_type: [...]}) into compiled descriptor
    set bytes — the same artifact protoc's --descriptor_set_out
    produces, built with the module's own wire writer. load_descriptor
    reads it straight back."""
    return encode_message({"file": files},
                          _DESCRIPTOR_REGISTRY[".g.FileDescriptorSet"],
                          _DESCRIPTOR_REGISTRY)

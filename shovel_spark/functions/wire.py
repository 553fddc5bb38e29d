"""Pure-Python wire codecs: protobuf, msgpack, JSON5.

The reference ships protobuf/msgpack/json5 decoder+encoder pairs
(src/decoders/{protobuf,msgpack,json5}.js, src/encoders/*.js) backed by npm
libraries. None of those libraries' Python twins exist in this sandbox, so
these are from-scratch implementations of the PUBLIC wire specifications:

  - protobuf: the wire format (varint / zigzag / tag = field<<3|wiretype /
    length-delimited), per the public encoding docs. Field layout comes from
    a spec dict or a minimal ``.proto`` parser (the reference's
    ``proto_path`` config surface, src/decoders/protobuf.js:20-43).
    Delimited mode = varint-length-prefixed concatenation, matching
    protobufjs ``encodeDelimited`` / ``decodeDelimited``
    (src/decoders/protobuf.js:111-141 keeps a remainder buffer; batch rows
    are complete payloads so the remainder problem disappears).
  - msgpack: the msgpack spec (fixint/fixstr/fixmap/... family bytes).
    Matches what msgpackr's ``pack`` emits for plain JSON-shaped objects.
  - JSON5: parser (comments, single quotes, unquoted keys, trailing commas,
    hex, Infinity/NaN) and a stringifier matching the json5 npm package's
    output shape — bare identifier keys, single-quoted strings, and in
    pretty mode trailing commas (`{\\n   test: 'ok',\\n}` for indent 3).

Everything here is plain bytes→object / object→bytes Python, used ONLY
inside Arrow-batched pandas UDFs (codecs.py) — never row-at-a-time
spark-side interpretation.
"""

from __future__ import annotations

import json
import math
import re
import struct as _struct
import unicodedata

# ---------------------------------------------------------------------------
# varint / zigzag (public protobuf encoding spec)
# ---------------------------------------------------------------------------

def encode_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, per spec
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(data: bytes, pos: int) -> tuple[int, int]:
    """-> (value, new_pos). Raises ValueError on truncation."""
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _to_signed64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _to_signed32(n: int) -> int:
    n &= (1 << 32) - 1
    return n - (1 << 32) if n >= (1 << 31) else n


# ---------------------------------------------------------------------------
# protobuf message codec
# ---------------------------------------------------------------------------

#: type -> (wire_type, pack fn value->bytes-after-tag, unpack fn)
_SCALARS = {
    "int32": 0,
    "int64": 0,
    "uint32": 0,
    "uint64": 0,
    "sint32": 0,
    "sint64": 0,
    "bool": 0,
    "enum": 0,
    "fixed64": 1,
    "sfixed64": 1,
    "double": 1,
    "string": 2,
    "bytes": 2,
    "fixed32": 5,
    "sfixed32": 5,
    "float": 5,
}


class ProtoSpec:
    """Field layout of one message: [(field_number, name, type, repeated)].

    The runtime twin of the reference's protobufjs ``lookupType`` result —
    built either literally or from ``parse_proto`` below.
    """

    def __init__(self, fields: list[tuple[int, str, str]] | list[tuple[int, str, str, bool]]):
        self.fields = []
        for f in fields:
            num, name, typ = f[0], f[1], f[2]
            repeated = bool(f[3]) if len(f) > 3 else False
            if typ not in _SCALARS:
                raise ValueError(f"unsupported proto type: {typ}")
            self.fields.append((int(num), name, typ, repeated))
        self.by_num = {f[0]: f for f in self.fields}
        self.by_name = {f[1]: f for f in self.fields}


def _encode_field(num: int, typ: str, value) -> bytes:
    wt = _SCALARS[typ]
    tag = encode_varint((num << 3) | wt)
    if wt == 0:
        if typ == "bool":
            return tag + encode_varint(1 if value else 0)
        if typ in ("sint32", "sint64"):
            return tag + encode_varint(zigzag_encode(int(value)))
        return tag + encode_varint(int(value))
    if wt == 1:
        if typ == "double":
            return tag + _struct.pack("<d", float(value))
        return tag + _struct.pack("<q" if typ == "sfixed64" else "<Q", int(value))
    if wt == 5:
        if typ == "float":
            return tag + _struct.pack("<f", float(value))
        return tag + _struct.pack("<i" if typ == "sfixed32" else "<I", int(value))
    # wt == 2
    if typ == "string":
        payload = str(value).encode("utf-8")
    else:
        payload = bytes(value)
    return tag + encode_varint(len(payload)) + payload


def proto_encode(record: dict, spec: ProtoSpec) -> bytes:
    """dict -> message bytes. None / absent fields are omitted (proto3
    presence semantics; matches protobufjs for unset fields)."""
    out = bytearray()
    for num, name, typ, repeated in spec.fields:
        value = record.get(name)
        if value is None:
            continue
        if repeated:
            for v in value:
                if v is not None:
                    out += _encode_field(num, typ, v)
        else:
            out += _encode_field(num, typ, value)
    return bytes(out)


def proto_decode(data: bytes, spec: ProtoSpec) -> dict:
    """message bytes -> dict. Unknown fields are skipped (spec behavior);
    missing fields come back as None ([] for repeated)."""
    result = {name: ([] if rep else None) for _, name, _, rep in spec.fields}
    pos = 0
    n = len(data)
    while pos < n:
        key, pos = decode_varint(data, pos)
        num, wt = key >> 3, key & 7
        field = spec.by_num.get(num)
        if wt == 0:
            raw, pos = decode_varint(data, pos)
            if field is None:
                continue
            _, name, typ, rep = field
            if typ == "bool":
                val = bool(raw)
            elif typ in ("sint32", "sint64"):
                val = zigzag_decode(raw)
            elif typ == "int32":
                val = _to_signed32(raw)
            elif typ == "int64":
                val = _to_signed64(raw)
            else:
                val = raw
        elif wt == 1:
            chunk = data[pos : pos + 8]
            if len(chunk) != 8:
                raise ValueError("truncated fixed64")
            pos += 8
            if field is None:
                continue
            _, name, typ, rep = field
            if typ == "double":
                val = _struct.unpack("<d", chunk)[0]
            else:
                val = _struct.unpack("<q" if typ == "sfixed64" else "<Q", chunk)[0]
        elif wt == 5:
            chunk = data[pos : pos + 4]
            if len(chunk) != 4:
                raise ValueError("truncated fixed32")
            pos += 4
            if field is None:
                continue
            _, name, typ, rep = field
            if typ == "float":
                val = _struct.unpack("<f", chunk)[0]
            else:
                val = _struct.unpack("<i" if typ == "sfixed32" else "<I", chunk)[0]
        elif wt == 2:
            ln, pos = decode_varint(data, pos)
            chunk = data[pos : pos + ln]
            if len(chunk) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
            if field is None:
                continue
            _, name, typ, rep = field
            if typ == "string":
                val = chunk.decode("utf-8", errors="replace")
            elif typ == "bytes":
                val = bytes(chunk)
            else:
                # packed repeated scalars (wire type 2 carrying varints/fixeds)
                vals = []
                p = 0
                while p < ln:
                    if _SCALARS[typ] == 0:
                        raw, p = decode_varint(chunk, p)
                        if typ in ("sint32", "sint64"):
                            raw = zigzag_decode(raw)
                        elif typ == "int32":
                            raw = _to_signed32(raw)
                        elif typ == "int64":
                            raw = _to_signed64(raw)
                        elif typ == "bool":
                            raw = bool(raw)
                        vals.append(raw)
                    elif _SCALARS[typ] == 1:
                        fmt = "<d" if typ == "double" else ("<q" if typ == "sfixed64" else "<Q")
                        vals.append(_struct.unpack_from(fmt, chunk, p)[0])
                        p += 8
                    else:
                        fmt = "<f" if typ == "float" else ("<i" if typ == "sfixed32" else "<I")
                        vals.append(_struct.unpack_from(fmt, chunk, p)[0])
                        p += 4
                if rep:
                    result[name].extend(vals)
                    continue
                val = vals[-1] if vals else None
        else:
            raise ValueError(f"unsupported wire type {wt}")
        if field is not None:
            if rep:
                result[name].append(val)
            else:
                result[name] = val
    return result


def proto_encode_delimited(records: list[dict], spec: ProtoSpec) -> bytes:
    """Varint-length-prefixed concatenation — protobufjs encodeDelimited
    (reference encoder: src/encoders/protobuf.js:57-62 concats per-record)."""
    out = bytearray()
    for r in records:
        msg = proto_encode(r, spec)
        out += encode_varint(len(msg)) + msg
    return bytes(out)


def proto_decode_delimited(data: bytes, spec: ProtoSpec) -> list[dict]:
    """1 payload -> N records (reference: src/decoders/protobuf.js:111-141)."""
    out = []
    pos = 0
    while pos < len(data):
        ln, pos = decode_varint(data, pos)
        chunk = data[pos : pos + ln]
        if len(chunk) != ln:
            raise ValueError("truncated delimited message")
        pos += ln
        out.append(proto_decode(chunk, spec))
    return out


_PROTO_FIELD = re.compile(
    r"(?:\b(optional|required|repeated)\s+)?"
    r"\b(double|float|int32|int64|uint32|uint64|sint32|sint64|fixed32|fixed64|"
    r"sfixed32|sfixed64|bool|string|bytes)\s+"
    r"(\w+)\s*=\s*(\d+)\s*;"
)
_PROTO_MSG = re.compile(r"message\s+(\w+)\s*\{([^}]*)\}", re.S)


def parse_proto(text: str) -> dict[str, ProtoSpec]:
    """Minimal .proto parser: flat messages with scalar fields — enough for
    the reference's test schema (tests/assets/test.proto) and the decoder's
    proto_path config surface. Comments are stripped; nested messages,
    imports, enums, maps are out of scope (documented limitation)."""
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    specs = {}
    for m in _PROTO_MSG.finditer(text):
        name, body = m.group(1), m.group(2)
        fields = []
        for fm in _PROTO_FIELD.finditer(body):
            label, typ, fname, num = fm.groups()
            fields.append((int(num), fname, typ, label == "repeated"))
        specs[name] = ProtoSpec(fields)
    return specs


# ---------------------------------------------------------------------------
# msgpack (public spec; matches msgpackr `pack` for JSON-shaped values)
# ---------------------------------------------------------------------------

def msgpack_packb(obj) -> bytes:
    out = bytearray()
    _mp_pack(obj, out)
    return bytes(out)


def _mp_pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj & 0xFF)
        elif 0 < obj <= 0xFF:
            out += bytes((0xCC, obj))
        elif 0 < obj <= 0xFFFF:
            out.append(0xCD)
            out += _struct.pack(">H", obj)
        elif 0 < obj <= 0xFFFFFFFF:
            out.append(0xCE)
            out += _struct.pack(">I", obj)
        elif 0 < obj <= 0xFFFFFFFFFFFFFFFF:
            out.append(0xCF)
            out += _struct.pack(">Q", obj)
        elif -0x80 <= obj < 0:
            out.append(0xD0)
            out += _struct.pack(">b", obj)
        elif -0x8000 <= obj < 0:
            out.append(0xD1)
            out += _struct.pack(">h", obj)
        elif -0x80000000 <= obj < 0:
            out.append(0xD2)
            out += _struct.pack(">i", obj)
        elif -0x8000000000000000 <= obj < 0:
            out.append(0xD3)
            out += _struct.pack(">q", obj)
        else:
            raise OverflowError("int out of msgpack range")
    elif isinstance(obj, float):
        out.append(0xCB)
        out += _struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes((0xD9, n))
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += _struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += _struct.pack(">I", n)
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += bytes((0xC4, n))
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += _struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += _struct.pack(">I", n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += _struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += _struct.pack(">I", n)
        for v in obj:
            _mp_pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += _struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += _struct.pack(">I", n)
        for k, v in obj.items():
            _mp_pack(k if isinstance(k, str) else str(k), out)
            _mp_pack(v, out)
    else:
        raise TypeError(f"cannot msgpack {type(obj).__name__}")


def msgpack_unpackb(data: bytes):
    obj, pos = _mp_unpack(bytes(data), 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after msgpack value ({len(data) - pos})")
    return obj


def _mp_unpack(data: bytes, pos: int):
    if pos >= len(data):
        raise ValueError("truncated msgpack")
    b = data[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _mp_map(data, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _mp_array(data, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        return _mp_str(data, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:
        n = data[pos]
        return bytes(data[pos + 1 : pos + 1 + n]), pos + 1 + n
    if b == 0xC5:
        (n,) = _struct.unpack_from(">H", data, pos)
        return bytes(data[pos + 2 : pos + 2 + n]), pos + 2 + n
    if b == 0xC6:
        (n,) = _struct.unpack_from(">I", data, pos)
        return bytes(data[pos + 4 : pos + 4 + n]), pos + 4 + n
    if b == 0xCA:
        return _struct.unpack_from(">f", data, pos)[0], pos + 4
    if b == 0xCB:
        return _struct.unpack_from(">d", data, pos)[0], pos + 8
    if b == 0xCC:
        return data[pos], pos + 1
    if b == 0xCD:
        return _struct.unpack_from(">H", data, pos)[0], pos + 2
    if b == 0xCE:
        return _struct.unpack_from(">I", data, pos)[0], pos + 4
    if b == 0xCF:
        return _struct.unpack_from(">Q", data, pos)[0], pos + 8
    if b == 0xD0:
        return _struct.unpack_from(">b", data, pos)[0], pos + 1
    if b == 0xD1:
        return _struct.unpack_from(">h", data, pos)[0], pos + 2
    if b == 0xD2:
        return _struct.unpack_from(">i", data, pos)[0], pos + 4
    if b == 0xD3:
        return _struct.unpack_from(">q", data, pos)[0], pos + 8
    if b == 0xD9:
        return _mp_str(data, pos + 1, data[pos])
    if b == 0xDA:
        return _mp_str(data, pos + 2, _struct.unpack_from(">H", data, pos)[0])
    if b == 0xDB:
        return _mp_str(data, pos + 4, _struct.unpack_from(">I", data, pos)[0])
    if b == 0xDC:
        return _mp_array(data, pos + 2, _struct.unpack_from(">H", data, pos)[0])
    if b == 0xDD:
        return _mp_array(data, pos + 4, _struct.unpack_from(">I", data, pos)[0])
    if b == 0xDE:
        return _mp_map(data, pos + 2, _struct.unpack_from(">H", data, pos)[0])
    if b == 0xDF:
        return _mp_map(data, pos + 4, _struct.unpack_from(">I", data, pos)[0])
    raise ValueError(f"unsupported msgpack byte 0x{b:02x}")


def _mp_str(data: bytes, pos: int, n: int):
    chunk = data[pos : pos + n]
    if len(chunk) != n:
        raise ValueError("truncated msgpack str")
    return chunk.decode("utf-8", errors="replace"), pos + n


def _mp_array(data: bytes, pos: int, n: int):
    out = []
    for _ in range(n):
        v, pos = _mp_unpack(data, pos)
        out.append(v)
    return out, pos


def _mp_map(data: bytes, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _mp_unpack(data, pos)
        v, pos = _mp_unpack(data, pos)
        out[k] = v
    return out, pos


# ---------------------------------------------------------------------------
# JSON5 (public spec json5.org; output shape matches the json5 npm package)
# ---------------------------------------------------------------------------

_IDENT = re.compile(r"^[A-Za-z_$][A-Za-z0-9_$]*$")


def json5_dumps(obj, indent: int = 0) -> str:
    """Stringify like JSON5.stringify(obj, null, indent):

    - bare keys when the key is an identifier, else single-quoted
    - strings single-quoted (switching to double when fewer escapes)
    - pretty mode (indent>0) emits trailing commas, matching the npm
      package's serializer (reference encoder: src/encoders/json5.js:30).
    """
    return _j5_val(obj, indent, "")


def _j5_quote(s: str) -> str:
    sq, dq = s.count("'"), s.count('"')
    q = '"' if sq > dq else "'"
    out = [q]
    for ch in s:
        if ch == q or ch == "\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ord(ch) < 0x20 or ch in "  ":
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append(q)
    return "".join(out)


def _j5_num(x: float) -> str:
    if isinstance(x, bool):
        return "true" if x else "false"
    if isinstance(x, int):
        return str(x)
    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Infinity" if x > 0 else "-Infinity"
    return json.dumps(x)


def _j5_val(obj, indent: int, stepback: str) -> str:
    if obj is None:
        return "null"
    if isinstance(obj, bool):
        return "true" if obj else "false"
    if isinstance(obj, (int, float)):
        return _j5_num(obj)
    if isinstance(obj, str):
        return _j5_quote(obj)
    pad = stepback + " " * indent
    if isinstance(obj, (list, tuple)):
        if not obj:
            return "[]"
        items = [_j5_val(v, indent, pad) for v in obj]
        if indent:
            return "[\n" + ",\n".join(pad + i for i in items) + ",\n" + stepback + "]"
        return "[" + ",".join(items) + "]"
    if isinstance(obj, dict):
        if not obj:
            return "{}"
        items = []
        for k, v in obj.items():
            key = k if isinstance(k, str) and _IDENT.match(k) else _j5_quote(str(k))
            sep = ": " if indent else ":"
            items.append(key + sep + _j5_val(v, indent, pad))
        if indent:
            return "{\n" + ",\n".join(pad + i for i in items) + ",\n" + stepback + "}"
        return "{" + ",".join(items) + "}"
    raise TypeError(f"cannot json5-serialize {type(obj).__name__}")


class _J5Parser:
    """Recursive-descent JSON5 reader (reference decoder:
    src/decoders/json5.js uses the npm parser; this covers the spec's
    extensions over JSON: comments, unquoted keys, single quotes, trailing
    commas, hex ints, leading/trailing decimal point, Infinity/NaN,
    +-signs, and \\-escaped newlines in strings)."""

    def __init__(self, text: str):
        self.s = text
        self.i = 0

    def parse(self):
        self.ws()
        val = self.value()
        self.ws()
        if self.i != len(self.s):
            raise ValueError(f"trailing characters at {self.i}")
        return val

    def ws(self):
        s, n = self.s, len(self.s)
        while self.i < n:
            c = s[self.i]
            if c in " \t\n\r\v\f ﻿  " or unicodedata.category(c) == "Zs":
                self.i += 1
            elif c == "/" and self.i + 1 < n and s[self.i + 1] == "/":
                j = s.find("\n", self.i)
                self.i = n if j < 0 else j + 1
            elif c == "/" and self.i + 1 < n and s[self.i + 1] == "*":
                j = s.find("*/", self.i + 2)
                if j < 0:
                    raise ValueError("unterminated comment")
                self.i = j + 2
            else:
                return

    def value(self):
        c = self.peek()
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        if c in "'\"":
            return self.string()
        return self.number_or_word()

    def peek(self) -> str:
        if self.i >= len(self.s):
            raise ValueError("unexpected end of input")
        return self.s[self.i]

    def obj(self):
        self.i += 1  # {
        out = {}
        self.ws()
        if self.peek() == "}":
            self.i += 1
            return out
        while True:
            self.ws()
            c = self.peek()
            if c == "}":
                self.i += 1
                return out
            if c in "'\"":
                key = self.string()
            else:
                m = re.match(r"[A-Za-z_$][A-Za-z0-9_$]*", self.s[self.i :])
                if not m:
                    raise ValueError(f"bad object key at {self.i}")
                key = m.group(0)
                self.i += len(key)
            self.ws()
            if self.peek() != ":":
                raise ValueError(f"expected ':' at {self.i}")
            self.i += 1
            self.ws()
            out[key] = self.value()
            self.ws()
            c = self.peek()
            if c == ",":
                self.i += 1
            elif c == "}":
                self.i += 1
                return out
            else:
                raise ValueError(f"expected ',' or '}}' at {self.i}")

    def arr(self):
        self.i += 1  # [
        out = []
        self.ws()
        if self.peek() == "]":
            self.i += 1
            return out
        while True:
            self.ws()
            if self.peek() == "]":
                self.i += 1
                return out
            out.append(self.value())
            self.ws()
            c = self.peek()
            if c == ",":
                self.i += 1
            elif c == "]":
                self.i += 1
                return out
            else:
                raise ValueError(f"expected ',' or ']' at {self.i}")

    _ESC = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f", "v": "\v", "0": "\0"}

    def string(self):
        q = self.s[self.i]
        self.i += 1
        out = []
        s, n = self.s, len(self.s)
        while True:
            if self.i >= n:
                raise ValueError("unterminated string")
            c = s[self.i]
            if c == q:
                self.i += 1
                return "".join(out)
            if c == "\\":
                self.i += 1
                e = s[self.i]
                if e == "u":
                    out.append(chr(int(s[self.i + 1 : self.i + 5], 16)))
                    self.i += 5
                elif e == "x":
                    out.append(chr(int(s[self.i + 1 : self.i + 3], 16)))
                    self.i += 3
                elif e in "\n\r  ":  # line continuation
                    self.i += 1
                    if e == "\r" and self.i < n and s[self.i] == "\n":
                        self.i += 1
                else:
                    out.append(self._ESC.get(e, e))
                    self.i += 1
            else:
                out.append(c)
                self.i += 1

    _NUM = re.compile(
        r"[+-]?(?:Infinity|NaN|0[xX][0-9a-fA-F]+|"
        r"(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
    )

    def number_or_word(self):
        rest = self.s[self.i :]
        for word, val in (("true", True), ("false", False), ("null", None)):
            if rest.startswith(word):
                self.i += len(word)
                return val
        m = self._NUM.match(rest)
        if not m:
            raise ValueError(f"unexpected token at {self.i}")
        tok = m.group(0)
        self.i += len(tok)
        sign = -1 if tok[0] == "-" else 1
        body = tok.lstrip("+-")
        if body == "Infinity":
            return sign * math.inf
        if body == "NaN":
            return math.nan
        if body[:2].lower() == "0x":
            return sign * int(body, 16)
        if re.fullmatch(r"\d+", body):
            return sign * int(body)
        return sign * float(body)


def json5_loads(text: str):
    return _J5Parser(text).parse()

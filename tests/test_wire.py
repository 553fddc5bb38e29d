"""Pure-Python wire codec tests (no Spark) — protobuf wire format, msgpack
spec bytes, JSON5 parse/stringify. Golden pairs mirror the reference's
codec tests (tests/decoders/*.js, tests/encoders/*.js); property tests
guard the general round-trip."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from shovel_spark.functions import wire


# --- protobuf ---------------------------------------------------------------

def test_proto_golden_pair_matches_protobufjs():
    """message Test { required string test = 1 } (reference:
    tests/assets/test.proto); encode({test:'ok'}) per the public wire spec
    is tag 0x0a (field 1, wire type 2), len 2, 'ok'."""
    spec = wire.ProtoSpec([(1, "test", "string")])
    assert wire.proto_encode({"test": "ok"}, spec) == b"\x0a\x02ok"
    assert wire.proto_decode(b"\x0a\x02ok", spec) == {"test": "ok"}


def test_proto_delimited_frames():
    spec = wire.ProtoSpec([(1, "test", "string")])
    data = wire.proto_encode_delimited([{"test": "ok"}, {"test": "no"}], spec)
    assert data == b"\x04\x0a\x02ok\x04\x0a\x02no"
    assert wire.proto_decode_delimited(data, spec) == [{"test": "ok"}, {"test": "no"}]


def test_proto_unknown_fields_skipped():
    spec_full = wire.ProtoSpec([(1, "a", "string"), (2, "b", "int64")])
    spec_partial = wire.ProtoSpec([(2, "b", "int64")])
    data = wire.proto_encode({"a": "xyz", "b": 42}, spec_full)
    assert wire.proto_decode(data, spec_partial) == {"b": 42}


def test_proto_parse_proto_file():
    specs = wire.parse_proto(
        """
        // a comment
        syntax = "proto2";
        message Test {
            required string test = 1;  /* inline */
            optional int64 n = 3;
            repeated double xs = 4;
        }
        """
    )
    assert specs["Test"].fields == [
        (1, "test", "string", False),
        (3, "n", "int64", False),
        (4, "xs", "double", True),
    ]


def test_proto_varint_boundaries():
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -2**63):
        enc = wire.encode_varint(n)
        dec, pos = wire.decode_varint(enc, 0)
        assert pos == len(enc)
        if n >= 0:
            assert dec == n
        else:
            assert wire._to_signed64(dec) == n


@settings(max_examples=200, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "s": st.text(max_size=40),
            "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "z": st.integers(min_value=-(2**31), max_value=2**31 - 1),
            "d": st.floats(allow_nan=False),
            "b": st.booleans(),
            "r": st.lists(st.text(max_size=10), max_size=5),
            "y": st.binary(max_size=30),
        }
    )
)
def test_proto_roundtrip_property(rec):
    spec = wire.ProtoSpec(
        [
            (1, "s", "string"),
            (2, "i", "int64"),
            (3, "z", "sint32"),
            (4, "d", "double"),
            (5, "b", "bool"),
            (6, "r", "string", True),
            (7, "y", "bytes"),
        ]
    )
    out = wire.proto_decode(wire.proto_encode(rec, spec), spec)
    assert out == rec


# --- msgpack ----------------------------------------------------------------

def test_msgpack_golden_bytes():
    """pack({test:'ok'}) == 81 a4 74 65 73 74 a2 6f 6b — what msgpackr's
    pack emits for the reference's encoder test (tests/encoders/msgpack.js)."""
    assert wire.msgpack_packb({"test": "ok"}) == b"\x81\xa4test\xa2ok"
    assert wire.msgpack_unpackb(b"\x81\xa4test\xa2ok") == {"test": "ok"}


def test_msgpack_family_bytes():
    cases = [
        (None, b"\xc0"),
        (True, b"\xc3"),
        (False, b"\xc2"),
        (0, b"\x00"),
        (127, b"\x7f"),
        (-1, b"\xff"),
        (-32, b"\xe0"),
        (128, b"\xcc\x80"),
        (65536, b"\xce\x00\x01\x00\x00"),
        (-33, b"\xd0\xdf"),
    ]
    for val, enc in cases:
        assert wire.msgpack_packb(val) == enc, val
        assert wire.msgpack_unpackb(enc) == val


json_like = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False)
    | st.text(max_size=30)
    | st.binary(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=12,
)


@settings(max_examples=200, deadline=None)
@given(json_like)
def test_msgpack_roundtrip_property(v):
    assert wire.msgpack_unpackb(wire.msgpack_packb(v)) == v


def test_msgpack_truncated_raises():
    with pytest.raises(ValueError):
        wire.msgpack_unpackb(b"\xa5ab")
    with pytest.raises(ValueError):
        wire.msgpack_unpackb(b"\x81\xa1k")  # map missing its value


# --- JSON5 ------------------------------------------------------------------

def test_json5_stringify_matches_npm_shape():
    """JSON5.stringify({test:'ok'}) and the pretty (indent-3) form with
    trailing commas (reference: tests/encoders/json5.js:8-27)."""
    assert wire.json5_dumps({"test": "ok"}) == "{test:'ok'}"
    assert wire.json5_dumps({"test": "ok"}, indent=3) == "{\n   test: 'ok',\n}"
    assert wire.json5_dumps({"a-b": 1}) == "{'a-b':1}"
    assert wire.json5_dumps([1, "x"]) == "[1,'x']"
    assert wire.json5_dumps([1], indent=3) == "[\n   1,\n]"


def test_json5_parse_extensions():
    src = """
    // line comment
    { unquoted: 'single', "double": "ok", /* block */ trailing: [1, 2,],
      hex: 0xFF, half: .5, plus: +3, inf: Infinity, neg: -Infinity,
      exp: 1e2, esc: 'it\\'s\\na line', }
    """
    out = wire.json5_loads(src)
    assert out["unquoted"] == "single"
    assert out["double"] == "ok"
    assert out["trailing"] == [1, 2]
    assert out["hex"] == 255
    assert out["half"] == 0.5
    assert out["plus"] == 3
    assert out["inf"] == math.inf and out["neg"] == -math.inf
    assert out["exp"] == 100.0
    assert out["esc"] == "it's\na line"


def test_json5_parse_nan():
    assert math.isnan(wire.json5_loads("NaN"))


def test_json5_bad_input_raises():
    for bad in ("{", "[1", "{a}", "'unterminated", "{a:1} extra"):
        with pytest.raises(ValueError):
            wire.json5_loads(bad)


json5_value = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=True)
    | st.text(max_size=25),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=10,
)


@settings(max_examples=200, deadline=None)
@given(json5_value, st.sampled_from([0, 3]))
def test_json5_roundtrip_property(v, indent):
    assert wire.json5_loads(wire.json5_dumps(v, indent=indent)) == v


def test_proto_packed_sfixed_negative():
    """Packed repeated sfixed values must decode SIGNED (regression: the
    packed branch used unsigned formats)."""
    import struct

    spec32 = wire.ProtoSpec([(1, "xs", "sfixed32", True)])
    packed32 = b"\x0a\x08" + struct.pack("<i", -1) + struct.pack("<i", 7)
    assert wire.proto_decode(packed32, spec32) == {"xs": [-1, 7]}
    spec64 = wire.ProtoSpec([(1, "xs", "sfixed64", True)])
    packed64 = b"\x0a\x10" + struct.pack("<q", -5) + struct.pack("<q", 9)
    assert wire.proto_decode(packed64, spec64) == {"xs": [-5, 9]}


def test_json5_line_separator_whitespace():
    """U+2028/U+2029 are JSON5 whitespace (LineTerminators) — must not
    dead-letter spec-valid documents."""
    assert wire.json5_loads("{ 'test': 'ok' }") == {"test": "ok"}

"""Codec golden pairs — mirrors the reference's testDecoder/testEncoder
harness (reference: tests/utils.js:9-69, tests/decoders/*.js)."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from shovel_spark.functions import codecs


def _one(spark, value, fn, typ="string"):
    df = spark.createDataFrame([(value,)], f"v {typ}")
    return df.select(fn(F.col("v")).alias("out")).first()["out"]


def test_json_roundtrip(spark):
    """reference: tests/decoders/json.js:5-13 — '{"test":"ok"}' → {test:'ok'}"""
    out = _one(spark, '{"test":"ok"}', lambda c: codecs.decode_json(c, "test string"))
    assert out.test == "ok"
    back = _one(
        spark, '{"test":"ok"}',
        lambda c: codecs.encode_json(codecs.decode_json(c, "test string")),
    )
    assert back == '{"test":"ok"}'


def test_json_parse_error_is_null_not_crash(spark):
    out = _one(spark, "{nope", lambda c: codecs.decode_json(c, "test string"))
    assert out is None or out.test is None


def test_base64_pair(spark):
    """reference: tests/decoders/base64.js — base64('ok') → 'ok'"""
    enc = base64.b64encode(b"ok").decode()
    assert _one(spark, enc, codecs.decode_base64) == "ok"
    assert _one(spark, "ok", codecs.encode_base64) == enc


def test_csv_pair(spark):
    """reference: src/decoders/csv.js:6-31 delimiter/columns options"""
    out = _one(spark, "a;b;3", lambda c: codecs.decode_csv(c, "x string, y string, n int", delimiter=";"))
    assert (out.x, out.y, out.n) == ("a", "b", 3)
    row = _one(
        spark, "a;b;3",
        lambda c: codecs.encode_csv(codecs.decode_csv(c, "x string, y string, n int", delimiter=";"), delimiter=";"),
    )
    assert row == "a;b;3"


def test_multiline_blocks(spark):
    """batch form of the accumulate-until-blank-line decoder
    (reference: src/decoders/multiline.js — WIP there, well-defined here)"""
    lines = ["alpha", "beta", "", "gamma", "", "delta", "epsilon"]
    df = spark.createDataFrame(list(enumerate(lines)), "id long, line string")
    blocks = {r["block"] for r in codecs.assemble_multiline(df).collect()}
    assert blocks == {"alpha\nbeta", "gamma", "delta\nepsilon"}


def test_render_template_fields_and_date(spark):
    """reference: renderTemplate (src/core/utils.js:45-67) + dynamic index
    name 'audit-events-{YYYY}-{MM}' (README.md:58)"""
    df = spark.createDataFrame(
        [("click", "2024-03-07 08:09:10")], "etype string, d string"
    ).withColumn("d", F.to_timestamp("d"))
    out = df.select(
        codecs.render_template(
            "audit-{etype}-{YYYY}-{MM}-{DD}", date_col="d"
        ).alias("t")
    ).first()["t"]
    assert out == "audit-click-2024-03-07"


def test_render_template_unpadded_tokens(spark):
    df = spark.createDataFrame([("2024-03-07 08:09:10",)], "d string").withColumn(
        "d", F.to_timestamp("d")
    )
    out = df.select(codecs.render_template("{M}/{D} {H}h", date_col="d").alias("t")).first()["t"]
    assert out == "3/7 8h"


def test_msgpack_golden_pair(spark):
    """reference: tests/decoders/msgpack.js + tests/encoders/msgpack.js —
    pack({test:'ok'}) is the spec bytes 81 a4 't''e''s''t' a2 'o''k'."""
    golden = b"\x81\xa4test\xa2ok"
    udf = codecs.make_msgpack_decoder("test string")
    df = spark.createDataFrame([(bytearray(golden),)], "v binary")
    assert df.select(udf(F.col("v")).alias("o")).first()["o"].test == "ok"
    # encoder inverse
    enc = (
        spark.createDataFrame([("ok",)], "test string")
        .select(codecs.encode_msgpack(F.struct(F.col("test"))).alias("b"))
        .first()["b"]
    )
    assert bytes(enc) == golden


def test_msgpack_decode_error_is_null_row(spark):
    udf = codecs.make_msgpack_decoder("test string")
    df = spark.createDataFrame([(bytearray(b"\xc1garbage"),)], "v binary")
    out = df.select(udf(F.col("v")).alias("o")).first()["o"]
    assert out is None or out.test is None


def test_json5_golden_pair(spark):
    """reference: tests/decoders/json5.js + tests/encoders/json5.js —
    JSON5.stringify({test:'ok'}) == "{test:'ok'}"; pretty (indent 3) emits
    trailing commas."""
    udf = codecs.make_json5_decoder("test string")
    df = spark.createDataFrame([("// note\n{test: 'ok',}",)], "v string")
    assert df.select(udf(F.col("v")).alias("o")).first()["o"].test == "ok"
    one = spark.createDataFrame([("ok",)], "test string")
    compact = one.select(codecs.encode_json5(F.struct(F.col("test"))).alias("s")).first()["s"]
    assert compact == "{test:'ok'}"
    pretty = one.select(
        codecs.encode_json5(F.struct(F.col("test")), pretty=True).alias("s")
    ).first()["s"]
    assert pretty == "{\n   test: 'ok',\n}"


def test_protobuf_golden_pair(spark):
    """reference: tests/decoders/protobuf.js + tests/encoders/protobuf.js
    over tests/assets/test.proto (message Test { required string test = 1 }):
    encode({test:'ok'}) == 0a 02 'o''k'; delimited mode prefixes a varint
    length (protobufjs encodeDelimited)."""
    from shovel_spark.functions.wire import parse_proto

    spec = parse_proto("message Test { required string test = 1; }")["Test"]
    golden = b"\x0a\x02ok"

    udf = codecs.make_proto_decoder(spec, "test string")
    df = spark.createDataFrame([(bytearray(golden),)], "v binary")
    assert df.select(udf(F.col("v")).alias("o")).first()["o"].test == "ok"

    one = spark.createDataFrame([("ok",)], "test string")
    enc = one.select(codecs.encode_protobuf(F.struct(F.col("test")), spec).alias("b")).first()["b"]
    assert bytes(enc) == golden
    encd = one.select(
        codecs.encode_protobuf(F.struct(F.col("test")), spec, delimited=True).alias("b")
    ).first()["b"]
    assert bytes(encd) == b"\x04" + golden


def test_protobuf_delimited_fanout(spark):
    """1→N delimited decode (reference: src/decoders/protobuf.js:111-141):
    one varint-framed payload explodes to N typed records."""
    from shovel_spark.functions.wire import ProtoSpec, proto_encode_delimited

    spec = ProtoSpec([(1, "test", "string")])
    payload = proto_encode_delimited([{"test": "a"}, {"test": "b"}, {"test": "c"}], spec)
    udf = codecs.make_proto_decoder(spec, "test string", delimited=True)
    df = spark.createDataFrame([(bytearray(payload),)], "v binary")
    out = (
        df.select(F.explode(udf(F.col("v"))).alias("r"))
        .select("r.test")
        .collect()
    )
    assert sorted(r.test for r in out) == ["a", "b", "c"]


def test_protobuf_numeric_roundtrip(spark):
    """Wire-format coverage beyond the reference's string-only asset:
    varint/zigzag/fixed/bool survive a Spark-side encode→decode."""
    from shovel_spark.functions.wire import ProtoSpec

    spec = ProtoSpec([(1, "a", "int64"), (2, "b", "sint64"), (3, "c", "double"), (4, "d", "bool")])
    df = spark.createDataFrame([(7, -9, 2.5, True), (0, 0, -1.0, False)], "a long, b long, c double, d boolean")
    udf = codecs.make_proto_decoder(spec, "a long, b long, c double, d boolean")
    out = (
        df.select(codecs.encode_protobuf(F.struct("a", "b", "c", "d"), spec).alias("bin"))
        .select(udf(F.col("bin")).alias("o"))
        .select("o.*")
        .collect()
    )
    got = sorted((r.a or 0, r.b or 0, r.c, r.d or False) for r in out)
    assert got == [(0, 0, -1.0, False), (7, -9, 2.5, True)]


def test_parse_content_type(spark):
    """reference: parseContentType (src/core/utils.js:69-72) + default
    application/octet-stream (src/core/message.js:4)"""
    rows = [
        "text/html; charset=utf-8",
        "application/json",
        "",
        "Text/HTML; Charset=UTF-8; boundary=x",
    ]
    df = spark.createDataFrame([(r,) for r in rows], "v string")
    out = [r["o"] for r in df.select(codecs.parse_content_type(F.col("v")).alias("o")).collect()]
    assert out[0].mime == "text/html" and out[0].params["charset"] == "utf-8"
    assert out[1].mime == "application/json" and out[1].params == {}
    assert out[2].mime == "application/octet-stream"
    assert out[3].mime == "text/html" and out[3].params["charset"] == "UTF-8"
    assert out[3].params["boundary"] == "x"


def test_explode_delimited_json(spark):
    """1→N delimited decode (reference: src/decoders/protobuf.js:111-141
    delimited mode): one payload row fans out to N decoded records."""
    payload = '{"k": 1}\n{"k": 2}\n\n{"k": 3}'
    df = spark.createDataFrame([(10, payload), (20, '{"k": 9}')], "src long, v string")
    out = codecs.explode_delimited(df, "v", "k int").select("src", "record.k").collect()
    got = sorted((r.src, r.k) for r in out)
    assert got == [(10, 1), (10, 2), (10, 3), (20, 9)]


def test_explode_delimited_bad_segment_is_null_record(spark):
    df = spark.createDataFrame([(1, '{"k": 1}\n{oops'),], "src long, v string")
    out = codecs.explode_delimited(df, "v", "k int").collect()
    ks = sorted([r.record.k if r.record else None for r in out], key=lambda x: (x is None, x))
    assert ks == [1, None]


def test_multiline_partition_scoped_two_files(spark):
    """Scale-safe multiline: with part_col, blocks never span files and the
    plan has no single-partition global sort (the global-window form's
    scale-killer)."""
    rows = [
        ("f1", 0, "a1"), ("f1", 1, "a2"), ("f1", 2, ""), ("f1", 3, "b1"),
        ("f2", 0, "c1"), ("f2", 1, ""), ("f2", 2, "d1"), ("f2", 3, "d2"),
    ]
    df = spark.createDataFrame(rows, "file string, id long, line string").repartition(4)
    out = codecs.assemble_multiline(df, part_col="file")
    got = {(r.file, r.block) for r in out.collect()}
    assert got == {("f1", "a1\na2"), ("f1", "b1"), ("f2", "c1"), ("f2", "d1\nd2")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_multiline_block_order_survives_shuffle(spark):
    """Lines inside a block come back in order even when input partitioning
    scrambles row order (array_sort on the carried order key)."""
    lines = [(i, line) for i, line in enumerate(["x1", "x2", "x3", "", "y1", "y2"])]
    df = spark.createDataFrame(list(reversed(lines)), "id long, line string").repartition(5)
    blocks = {r.block for r in codecs.assemble_multiline(df).collect()}
    assert blocks == {"x1\nx2\nx3", "y1\ny2"}


def test_protobuf_json_content_type_mode(spark):
    """reference: tests/decoders/protobuf.js 'decode: json' — the protobuf
    decoder slot accepts JSON payloads when content-type says so."""
    from shovel_spark.functions.wire import ProtoSpec, proto_encode

    spec = ProtoSpec([(1, "test", "string")])
    rows = [
        (bytearray(proto_encode({"test": "wire"}, spec)), "application/octet-stream"),
        (bytearray(b'{"test":"json"}'), "application/json; charset=utf-8"),
    ]
    df = spark.createDataFrame(rows, "v binary, ct string")
    out = df.select(
        codecs.decode_proto_or_json(F.col("v"), F.col("ct"), spec, "test string").alias("o")
    ).collect()
    assert sorted(r.o.test for r in out) == ["json", "wire"]


def test_protobuf_json_content_type_split_df(spark):
    """DataFrame split-union form: same result as the Column form, and the
    JSON half's plan contains no ArrowEvalPython stage."""
    from shovel_spark.functions.wire import ProtoSpec, proto_encode

    spec = ProtoSpec([(1, "test", "string")])
    rows = [
        (bytearray(proto_encode({"test": "wire"}, spec)), "application/octet-stream"),
        (bytearray(b'{"test":"json"}'), "application/json"),
    ]
    df = spark.createDataFrame(rows, "v binary, ct string")
    out = codecs.decode_proto_or_json_df(df, "v", "ct", spec, "test string")
    assert sorted(r.record.test for r in out.collect()) == ["json", "wire"]
    # the helper's OWN plan: exactly one Python stage (the wire half) — the
    # JSON half must contribute none
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1


def test_decode_proto_or_json_df_null_content_type_not_dropped(spark):
    """NULL content-type rows take the wire path (octet-stream default) —
    a raw NULL predicate would silently drop them from both halves."""
    from shovel_spark.functions.wire import ProtoSpec, proto_encode

    spec = ProtoSpec([(1, "test", "string")])
    df = spark.createDataFrame(
        [(bytearray(proto_encode({"test": "nullct"}, spec)), None)], "v binary, ct string"
    )
    out = codecs.decode_proto_or_json_df(df, "v", "ct", spec, "test string").collect()
    assert len(out) == 1 and out[0].record.test == "nullct"


def test_raw_prefilter_before_parse_equivalent_and_selective(spark):
    """Sparser-style filter-before-parse: the prefiltered parse returns
    EXACTLY the rows of the unfiltered parse + predicate (the raw filter
    over-approximates; the exact predicate after from_json removes false
    positives), and the prefilter alone keeps a strict subset of lines."""
    from pyspark.sql import functions as F

    from shovel_spark.functions.codecs import decode_json, raw_prefilter

    rows = [
        '{"user": "ann", "lang": "fr", "n": 1}',
        '{"user": "bob", "lang": "en", "n": 2}',
        '{"user": "cfr", "lang": "en", "n": 3}',   # 'fr' in user: false positive
        '{"user": "dan", "lang": "fr", "n": 4}',
        "not json at all fr",                       # false positive + parse failure
    ]
    df = spark.createDataFrame([(r,) for r in rows], "value string")
    schema = "user string, lang string, n int"

    def parsed(frame):
        return (
            frame.withColumn("r", decode_json(F.col("value"), schema))
            .select("r.*")
            .filter(F.col("lang") == "fr")
        )

    full = {(r.user, r.n) for r in parsed(df).collect()}
    pre = df.filter(raw_prefilter(F.col("value"), ["fr"]))
    fast = {(r.user, r.n) for r in parsed(pre).collect()}
    assert fast == full == {("ann", 1), ("dan", 4)}
    assert pre.count() == 4  # the 'en'-only line was dropped raw, pre-parse


def test_xml_codec_golden_pairs(spark):
    """decode_xml/encode_xml: golden parse pairs, roundtrip identity for a
    matching schema, and per-row NULL isolation on malformed input (same
    policy as the json decoder)."""
    from shovel_spark.functions.codecs import decode_xml, encode_xml

    df = spark.createDataFrame(
        [
            ("<r><a>7</a><b>hi</b></r>",),
            ("<r><b>only</b></r>",),       # missing field -> NULL member
            ("not xml at all <<",),        # malformed -> NULL struct
        ],
        "x string",
    )
    rows = df.select(decode_xml(F.col("x"), "a INT, b STRING").alias("s")).collect()
    assert (rows[0].s.a, rows[0].s.b) == (7, "hi")
    assert rows[1].s.a is None and rows[1].s.b == "only"
    assert rows[2].s is None or (rows[2].s.a is None and rows[2].s.b is None)

    rt = (
        spark.range(3)
        .select(F.struct(F.col("id").alias("a"), F.lit("z").alias("b")).alias("s"))
        .select(encode_xml(F.col("s")).alias("x"))
        .select(decode_xml(F.col("x"), "a BIGINT, b STRING").alias("s"))
        .select("s.*")
        .collect()
    )
    assert [(r.a, r.b) for r in rt] == [(0, "z"), (1, "z"), (2, "z")]

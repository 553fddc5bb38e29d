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


def test_msgpack_decoder_gated(spark):
    """msgpack is not in this sandbox: the factory must fail at plan time
    (ImportError), never mid-job."""
    try:
        import msgpack  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError):
            codecs.make_msgpack_decoder("k int")
        return
    # if present, exercise a golden pair (reference: tests/decoders/msgpack.js)
    import msgpack as _m

    udf = codecs.make_msgpack_decoder("test string")
    df = spark.createDataFrame([(bytearray(_m.packb({"test": "ok"})),)], "v binary")
    assert df.select(udf(F.col("v")).alias("o")).first()["o"].test == "ok"


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

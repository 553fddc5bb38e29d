"""Grok compiler: pattern→regex compilation, typed captures, error isolation.
(the syslog-input analog, reference: src/inputs/syslog.js:44-56)"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.functions.grok import GrokError, compile_grok, grok_to_regex

ACCESS = '%{IP:client} %{USER:user} "%{WORD:method} %{URIPATH:path}" %{NUMBER:status:int} %{NUMBER:bytes:long}'

LINES = [
    '10.0.0.1 alice "GET /index.html" 200 5120',
    '192.168.1.9 bob "POST /api/v1/items" 201 64',
    "total garbage line",
    '10.0.0.2 carol "DELETE /x" 204 0',
]


def test_grok_to_regex_compiles():
    regex, fields = grok_to_regex(ACCESS)
    assert [f for f, _ in fields] == ["client", "user", "method", "path", "status", "bytes"]
    assert dict(fields)["status"] == "int"


def test_grok_extracts_typed_fields(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "line string")
    out = df.select(compile_grok(ACCESS).alias("g")).collect()
    g0 = out[0]["g"]
    assert (g0.client, g0.user, g0.method, g0.path) == ("10.0.0.1", "alice", "GET", "/index.html")
    assert (g0.status, g0.bytes) == (200, 5120)
    assert isinstance(g0.status, int)
    assert out[2]["g"].ok is False  # garbage line flagged, not crashed
    assert out[2]["g"].client is None
    assert sum(1 for r in out if r["g"].ok) == 3


def test_grok_syslog_style(spark):
    expr = "%{SYSLOGTIMESTAMP:ts} %{HOSTNAME:host} %{WORD:prog}: %{GREEDYDATA:msg}"
    df = spark.createDataFrame(
        [("Mar  7 08:09:10 web01 sshd: Accepted publickey for root",)], "line string"
    )
    g = df.select(compile_grok(expr).alias("g")).first()["g"]
    assert g.host == "web01" and g.prog == "sshd"
    assert g.msg == "Accepted publickey for root"


def test_grok_custom_patterns_and_errors():
    with pytest.raises(GrokError, match="unknown grok pattern"):
        grok_to_regex("%{NOPE:x}")
    with pytest.raises(GrokError, match="captures no fields"):
        grok_to_regex("%{IP} static")
    regex, fields = grok_to_regex("%{HEX:h}", patterns={"HEX": r"[0-9a-f]+"})
    assert fields == [("h", "string")]


def test_grok_stays_jvm_side(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "line string")
    plan = df.select(compile_grok(ACCESS).alias("g"))._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Python" not in plan and "ArrowEval" not in plan  # pure codegen

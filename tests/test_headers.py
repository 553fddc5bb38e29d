"""Message-header envelope: lowercased map, content-type default, and
per-message sink override riding on the headers (reference:
src/core/message.js:56-63 setup, :81-92 get/setHeader lowercasing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.operators.route import (
    SinkRule,
    apply_routes,
    header_override_rule,
    promote_headers,
)


def _pages(spark):
    rows = [
        # url, html-ok?, lang, headers
        ("u1", True, "en", {"X-Shovel-Sink": "audit"}),  # mixed-case key → lowered
        ("u2", True, "en", {"content-type": "text/html"}),
        ("u3", True, "fr", None),  # no headers at all
        ("u4", False, "en", {"x-shovel-sink": "audit"}),  # reject wins over override
    ]
    df = spark.createDataFrame(
        rows, "url string, ok boolean, lang_norm string, headers map<string,string>"
    )
    return df.withColumn(
        "parsed", F.struct(F.col("ok").alias("ok"))
    ).withColumn("rule_action", F.lit(None).cast("string"))


def test_promote_headers_lowercases_and_defaults(spark):
    out = promote_headers(_pages(spark)).collect()
    by_url = {r.url: r for r in out}
    assert by_url["u1"].headers == {"x-shovel-sink": "audit"}
    assert by_url["u1"].hdr_sink == "audit"
    assert by_url["u1"].content_type == "application/octet-stream"
    assert by_url["u2"].content_type == "text/html"
    assert by_url["u3"].headers == {} and by_url["u3"].hdr_sink is None


def test_header_sink_override_first_match(spark):
    rules = [header_override_rule(), SinkRule("english", F.col("lang_norm") == "en")]
    routed = apply_routes(promote_headers(_pages(spark)), rules).collect()
    got = {r.url: (r.status, r.sink) for r in routed}
    assert got["u1"] == ("acked", "audit")  # override beats the lang rule
    assert got["u2"] == ("acked", "english")
    assert got["u3"] == ("ignored", None)  # fr matches nothing
    assert got["u4"] == ("rejected", "dead_letter")  # reject trumps override


def test_header_mutation_api(spark):
    """set/delete/inc header parity (reference: tests/core/message.js —
    setHeader lowercases, incHeader counts, deleteHeader removes; the
    queue-retries counter rides on this, src/queues/batch.js:232)."""
    from shovel_spark.operators.route import delete_header, inc_header, set_header

    df = promote_headers(_pages(spark)).select("url", "headers")
    df = set_header(df, "Queue-Retries", "1")
    df = inc_header(df, "queue-retries")          # 1 -> 2
    df = inc_header(df, "queue-retries", by=2)    # 2 -> 4
    df = inc_header(df, "queue-retries", by=-1)   # 4 -> 3 (decHeader)
    df = set_header(df, "X-Trace", "t1")
    df = delete_header(df, "x-trace")
    rows = {r.url: r.headers for r in df.collect()}
    assert all(h.get("queue-retries") == "3" for h in rows.values())
    assert all("x-trace" not in h for h in rows.values())
    # u1's original override header survives the mutations, still lowercased
    assert rows["u1"]["x-shovel-sink"] == "audit"
    # incrementing a missing header yields null (the dead-letterable analog
    # of the reference's throw)
    bad = inc_header(promote_headers(_pages(spark)), "nope").select("headers").first()
    assert bad.headers.get("nope") is None


def test_promote_headers_case_colliding_keys_last_wins(spark):
    """Two keys differing only by case must resolve last-wins (JS object
    assignment), never crash with DUPLICATE_MAP_KEY."""
    df = spark.createDataFrame(
        [("u", {"X-K": "first", "x-k": "second"})], "url string, headers map<string,string>"
    )
    h = promote_headers(df).select("headers").first().headers
    assert list(h) == ["x-k"] and h["x-k"] in ("first", "second")


def test_set_header_on_null_map_creates_entry(spark):
    from shovel_spark.operators.route import inc_header, set_header

    df = spark.createDataFrame([("u", None)], "url string, headers map<string,string>")
    out = set_header(df, "K", "v").select("headers").first().headers
    assert out == {"k": "v"}
    out2 = inc_header(set_header(df, "n", "1"), "n").select("headers").first().headers
    assert out2["n"] == "2"


def test_header_override_in_broadcast_mode(spark):
    """Broadcast dispatch honors the per-message header sink alongside the
    predicate sinks (a row can land in BOTH its override and a lang sink)."""
    from shovel_spark.operators.route import apply_routes_broadcast

    rules = [header_override_rule(), SinkRule("english", F.col("lang_norm") == "en")]
    out = apply_routes_broadcast(promote_headers(_pages(spark)), rules).collect()
    got = {r.url: (r.status, sorted(r.sinks)) for r in out}
    assert got["u1"] == ("acked", ["audit", "english"])
    assert got["u2"] == ("acked", ["english"])
    assert got["u3"] == ("ignored", [])
    assert got["u4"] == ("rejected", ["dead_letter"])

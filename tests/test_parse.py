"""Parse-stage invariants — the gate for everything else (SURVEY.md §7 step 2).

Mirrors the reference's golden decoder pairs (reference:
tests/utils.js:9-37 testDecoder harness): known html bytes in, exact text out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.functions.parse import parse_pages
from shovel_spark.synth import NON_ASCII_SUFFIX, synth_pages

N = 2000
SEED = 7


def _parsed(spark, impl):
    return parse_pages(synth_pages(spark, N, seed=SEED), impl=impl).select(
        "url", "html", F.col("text").alias("expected"), "lang", "parsed.*"
    )


def test_byte_identical_text_per_url(spark):
    """input_hint invariant: encode(extracted) == expected text bytes, per url."""
    rows = _parsed(spark, "pandas").filter(F.col("ok")).collect()
    assert len(rows) > N * 0.9
    for r in rows:
        assert r["text"] == r["expected"], f"text mismatch for {r['url']}"
        assert r["text"].encode("utf-8") in bytes(r["html"])


def test_all_parser_impls_agree(spark):
    a = _parsed(spark, "pandas").select("url", "text", "title", "ok").sort("url").collect()
    b = _parsed(spark, "native").select("url", "text", "title", "ok").sort("url").collect()
    c = _parsed(spark, "regex").select("url", "text", "title", "ok").sort("url").collect()
    assert a == b == c


def test_malformed_html_flagged_not_crashed(spark):
    df = _parsed(spark, "pandas")
    bad = df.filter(~F.col("ok"))
    n_bad = bad.count()
    assert n_bad > 0  # synth plants ~2% malformed rows
    assert bad.filter(F.col("error").isNull()).count() == 0
    assert bad.filter(F.col("text").isNotNull()).count() == 0


def test_non_ascii_rows_survive_utf8_roundtrip(spark):
    df = _parsed(spark, "pandas").filter(F.col("ok") & F.col("text").endswith(NON_ASCII_SUFFIX))
    rows = df.collect()
    assert rows, "synth should plant non-ascii rows"
    for r in rows:
        assert r["text"].encode("utf-8") in bytes(r["html"])


def test_uuid_and_domain_deterministic(spark):
    df1 = parse_pages(synth_pages(spark, 500, seed=3)).select("url", "uuid", "domain")
    df2 = parse_pages(synth_pages(spark, 500, seed=3)).select("url", "uuid", "domain")
    assert df1.sort("url").collect() == df2.sort("url").collect()
    r = df1.filter(F.col("url").startswith("https://news.example.com/")).first()
    assert r["domain"] == "news.example.com"

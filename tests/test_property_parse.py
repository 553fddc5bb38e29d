"""Property-based tests (hypothesis): the parse invariant holds for ARBITRARY
text, not just the synth generator's vocabulary — unicode, quotes, regex
metacharacters, empty strings.

Strategy note: one Spark job per hypothesis example would be minutes-slow, so
examples are drawn in batches and each batch is one DataFrame."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from shovel_spark.functions.parse import parse_html_native, parse_html_pandas, parse_html_regex

# text without the markers the wrapper uses (the invariant is about exact
# recovery of the wrapped body, so the body must not itself close the tag)
body_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
).filter(lambda s: "</p>" not in s and "</title>" not in s)


def _wrap(title: str, body: str) -> bytes:
    return f"<html><head><title>{title}</title></head><body><p>{body}</p></body></html>".encode()


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(body_text, body_text), min_size=1, max_size=40))
def test_parse_recovers_arbitrary_unicode_bodies(spark, cases):
    rows = [(i, _wrap(t, b)) for i, (t, b) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, html binary")
    for parser in (parse_html_native, parse_html_pandas, parse_html_regex):
        got = {
            r["i"]: (r["o"]["text"], r["o"]["title"], r["o"]["ok"])
            for r in df.select("i", parser(F.col("html")).alias("o")).collect()
        }
        for i, (title, body) in enumerate(cases):
            assert got[i] == (body, title, True), f"{parser} failed on {body!r}"
            assert got[i][0].encode("utf-8") in bytes(rows[i][1])  # byte-identity


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.binary(max_size=80).filter(lambda b: b"<p>" not in b), min_size=1, max_size=30))
def test_parse_never_crashes_on_garbage(spark, blobs):
    df = spark.createDataFrame([(i, b) for i, b in enumerate(blobs)], "i long, html binary")
    for parser in (parse_html_native, parse_html_pandas):
        rows = df.select("i", parser(F.col("html")).alias("o")).collect()
        assert all(r["o"]["ok"] is False for r in rows)  # no body marker → reject
        assert all(r["o"]["error"] is not None for r in rows)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.dictionaries(
            st.sampled_from(["a", "b", "c"]),
            st.one_of(st.text(max_size=20), st.none()),
            min_size=1,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_json_codec_roundtrip_property(spark, dicts):
    import json

    from shovel_spark.functions.codecs import decode_json

    rows = [(json.dumps(d),) for d in dicts]
    df = spark.createDataFrame(rows, "v string")
    out = df.select(decode_json(F.col("v"), "a string, b string, c string").alias("o")).collect()
    for d, r in zip(dicts, out):
        for k in ("a", "b", "c"):
            assert getattr(r["o"], k) == d.get(k)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(
            st.from_regex(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", fullmatch=True),
            st.from_regex(r"[A-Za-z][A-Za-z0-9_]{0,10}", fullmatch=True),
            st.integers(-(2**31), 2**31 - 1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_grok_roundtrip_property(spark, rows):
    """Grok recovers arbitrary (ip, word, int) triples rendered into lines."""
    from shovel_spark.functions.grok import compile_grok

    lines = [(f"{ip} {word} n={n}",) for ip, word, n in rows]
    df = spark.createDataFrame(lines, "line string")
    g = compile_grok("%{IP:ip} %{WORD:word} n=%{INT:n:long}")
    got = [tuple(r["g"]) for r in df.select(g.alias("g")).collect()]
    for (ip, word, n), (gip, gword, gn, ok) in zip(rows, got):
        assert ok and (gip, gword, gn) == (ip, word, n)

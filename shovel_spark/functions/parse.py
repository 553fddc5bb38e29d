"""Parse stage — the decoder-slot analog (SURVEY.md §2.2).

Shovel decodes ``message.source`` bytes into ``message.content`` one message
at a time on the event loop (reference: src/core/message.js:71-74, e.g.
src/decoders/json.js:1-15). Here the whole stage is one Arrow-vectorized
pandas UDF ``html: binary -> struct<text, title, ok, error>`` (the
north-rule-mandated grok/regex parse), plus a pure-JVM ``regexp_extract``
fast path that produces identical output and stays inside whole-stage
codegen. A parse failure maps to shovel's auto-reject on handler exception
(reference: src/core/node.js:461-466) — the row is flagged, not the task
failed (per-doc error isolation, reference: src/outputs/elasticsearch.js:156-165).

Byte-identity invariant: extraction slices the *decoded* utf-8 string between
the first ``<p>`` and the next ``</p>``; utf-8 decode/encode round-trips are
exact, so ``encode(extracted) == original bytes slice`` byte-for-byte.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from shovel_spark.schema import PARSED_SCHEMA

_P_OPEN = "<p>"
_P_CLOSE = "</p>"
_TITLE_RE = r"(?s)<title>(.*?)</title>"
_BODY_RE = r"(?s)<p>(.*?)</p>"


@pandas_udf(PARSED_SCHEMA)
def parse_html_pandas(html: pd.Series) -> pd.DataFrame:
    """Arrow-batched parse of raw html bytes.

    Vectorized over the Arrow batch with pandas str ops — no Spark-side
    per-row Python. ``errors`` on decode and missing body markers become
    ``ok=False`` rows (dead-letter path) instead of exceptions.
    """
    # 'replace' mirrors both the JVM decode path and the reference's
    # Buffer.toString (neither throws on malformed bytes; both emit U+FFFD)
    s = html.str.decode("utf-8", errors="replace")

    title = s.str.extract(_TITLE_RE, expand=False)
    body = s.str.extract(_BODY_RE, expand=False)

    ok = body.notna()
    error = pd.Series([None] * len(s), dtype=object)
    error[~ok] = "parse_error: missing <p>...</p> body"
    error[s.isna()] = "parse_error: null html"

    return pd.DataFrame({"text": body, "title": title, "ok": ok, "error": error})


def parse_html_regex(html: Column) -> Column:
    """JVM regexp variant: decode + regexp inside whole-stage codegen.

    Identical output to :func:`parse_html_pandas`; kept as the grok/regex
    reference implementation. The non-greedy ``(.*?)`` backtracks O(n²) on
    rows missing ``</p>`` — prefer :func:`parse_html_native` in the hot path.
    """
    s = _decode_utf8(html)
    # null html must parse as ok=false (not null: a null ok would slip past
    # the route's reject predicate), same as the pandas path's False
    ok = F.coalesce(s.rlike(_BODY_RE), F.lit(False))
    text = F.when(ok, F.regexp_extract(s, _BODY_RE, 1))
    title_ok = s.rlike(_TITLE_RE)
    title = F.when(title_ok, F.regexp_extract(s, _TITLE_RE, 1))
    error = F.when(
        s.isNull(), F.lit("parse_error: null html")  # same message as pandas impl
    ).when(~ok, F.lit("parse_error: missing <p>...</p> body"))
    return F.struct(
        text.alias("text"), title.alias("title"), ok.alias("ok"), error.alias("error")
    )


def _decode_utf8(html: Column) -> Column:
    """binary → string with U+FFFD replacement for invalid bytes.

    NOT ``F.decode(html, 'UTF-8')``: Spark 4's decode THROWS
    MALFORMED_CHARACTER_CODING on invalid utf-8 — one bad row would kill the
    task instead of dead-lettering (found by hypothesis). The binary→string
    cast replaces, matching both the pandas path (errors='replace') and the
    reference's Buffer.toString.
    """
    return html.cast("string")


def _span(s: Column, open_tag: str, close_tag: str) -> tuple[Column, Column]:
    """(ok, content) between the first open_tag and the next close_tag after
    it — linear-time locate/substring, no regex backtracking."""
    i = F.instr(s, open_tag)  # 1-based; 0 = absent
    j = F.call_function("locate", F.lit(close_tag), s, i + len(open_tag))
    ok = (i > 0) & (j > 0)
    content = F.when(ok, F.substring(s, i + len(open_tag), j - i - len(open_tag)))
    return ok, content


def parse_html_native(html: Column) -> Column:
    """JVM-only fast path: decode + locate/substring, fully codegen'd.

    Identical output to :func:`parse_html_pandas` (property-tested); this is
    the throughput path at 100 TB — zero Python, zero Arrow transfer, and
    linear-time even on malformed rows.
    """
    s = _decode_utf8(html)
    ok, text = _span(s, "<p>", "</p>")
    ok = F.coalesce(ok, F.lit(False))  # null html → ok=false, not null
    _t_ok, title = _span(s, "<title>", "</title>")
    error = F.when(
        s.isNull(), F.lit("parse_error: null html")  # same message as pandas impl
    ).when(~ok, F.lit("parse_error: missing <p>...</p> body"))
    return F.struct(
        text.alias("text"), title.alias("title"), ok.alias("ok"), error.alias("error")
    )


def domain_of(url: Column) -> Column:
    """Host of a url — plain string ops (~1.6× faster than the general
    ``parse_url`` evaluator; identical output on scheme://host/path urls).
    Falls short only on userinfo@/":port" forms — use :func:`domain_of_full`
    when inputs may carry those."""
    return F.substring_index(F.substring_index(url, "://", -1), "/", 1)


def domain_of_full(url: Column) -> Column:
    """Host via the general URL parser (handles ports, userinfo, queries)."""
    return F.parse_url(url, F.lit("HOST"))


def parse_pages(df: DataFrame, impl: str = "native") -> DataFrame:
    """Apply the parse stage: adds ``uuid, domain, parsed(text,title,ok,error)``.

    uuid is deterministic sha2(url) — shovel's cuid() default
    (reference: src/core/utils.js:104) is wall-clock+random and would break
    routed-row equality across runs (SURVEY.md §1.1).
    """
    parser = {
        "native": parse_html_native,
        "regex": parse_html_regex,
        "pandas": parse_html_pandas,
    }[impl]
    return (
        df.withColumn("uuid", F.sha2(F.col("url"), 256))
        .withColumn("domain", domain_of(F.col("url")))
        .withColumn("parsed", parser(F.col("html")))
    )

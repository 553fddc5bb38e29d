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
    s = html.str.decode("utf-8", errors="strict")

    title = s.str.extract(_TITLE_RE, expand=False)
    body = s.str.extract(_BODY_RE, expand=False)

    ok = body.notna()
    error = pd.Series([None] * len(s), dtype=object)
    error[~ok] = "parse_error: missing <p>...</p> body"
    error[s.isna()] = "parse_error: null html"

    return pd.DataFrame({"text": body, "title": title, "ok": ok, "error": error})


def parse_html_native(html: Column) -> Column:
    """JVM-only equivalent: decode + regexp inside whole-stage codegen.

    Identical output to :func:`parse_html_pandas` (property-tested); this is
    the throughput path at 100 TB — zero Python, zero Arrow transfer.
    """
    s = F.decode(html, "UTF-8")
    ok = s.rlike(_BODY_RE)
    text = F.when(ok, F.regexp_extract(s, _BODY_RE, 1))
    title_ok = s.rlike(_TITLE_RE)
    title = F.when(title_ok, F.regexp_extract(s, _TITLE_RE, 1))
    error = F.when(~ok, F.lit("parse_error: missing <p>...</p> body"))
    return F.struct(
        text.alias("text"), title.alias("title"), ok.alias("ok"), error.alias("error")
    )


def domain_of(url: Column) -> Column:
    """Registrable host of a url — native ``parse_url`` (no UDF)."""
    return F.parse_url(url, F.lit("HOST"))


def parse_pages(df: DataFrame, impl: str = "native") -> DataFrame:
    """Apply the parse stage: adds ``uuid, domain, parsed(text,title,ok,error)``.

    uuid is deterministic sha2(url) — shovel's cuid() default
    (reference: src/core/utils.js:104) is wall-clock+random and would break
    routed-row equality across runs (SURVEY.md §1.1).
    """
    parser = {"native": parse_html_native, "pandas": parse_html_pandas}[impl]
    return (
        df.withColumn("uuid", F.sha2(F.col("url"), 256))
        .withColumn("domain", domain_of(F.col("url")))
        .withColumn("parsed", parser(F.col("html")))
    )

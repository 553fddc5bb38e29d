"""Routing — shovel's node-graph dispatch re-expressed as status/sink columns.

The reference taxonomy (reference: src/core/processor.js:120-144):
  - handler exception  -> auto-reject (src/core/node.js:461-466)
  - node.reject()      -> rejected (drop as failure)
  - node.ignore()      -> ignored (drop benignly)
  - delivered + ack    -> acked

Here every row gets exactly one ``status`` and at most one ``sink`` in a
single ``when`` chain — one pass, no shuffle, fully codegen'd. Dead-lettered
rows keep their error for the dead-letter sink (per-doc error isolation,
reference: src/outputs/elasticsearch.js:156-165, instead of failing the task).

Sink predicates replicate the ``pipeline`` output's dispatch
(reference: src/outputs/pipeline.js:18-30):
  - *fanout* mode  = first-match-wins over an ordered predicate list
    (disjoint routing — each row to exactly one sink)
  - *broadcast* mode = every matching predicate receives the row
    (handled by the writer filtering the persisted frame per sink)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shovel_spark.schema import (
    DEAD_LETTER_SINK,
    STATUS_ACKED,
    STATUS_IGNORED,
    STATUS_REJECTED,
)


@dataclass(frozen=True)
class SinkRule:
    """One routing predicate -> sink name (ordered, first match wins)."""

    name: str
    predicate: Column


#: header key that carries a per-message sink override — the analog of the
#: reference's per-message routing metadata riding on the header map
#: (reference: src/core/message.js:89-92 setHeader / outputs reading
#: getHeader to steer delivery, e.g. src/encoders/protobuf.js:6,63).
SINK_OVERRIDE_HEADER = "x-shovel-sink"

_DEFAULT_CONTENT_TYPE = "application/octet-stream"  # src/core/message.js:4


def promote_headers(df: DataFrame, col: str = "headers") -> DataFrame:
    """Normalize the message-header envelope and promote hot keys.

    Mirrors the reference's Message semantics (src/core/message.js:56,81-92):
      - header keys are case-insensitive → lowercased once here, at plan
        time, instead of per-get;
      - a missing map becomes an empty map, and 'content-type' defaults to
        application/octet-stream (src/core/message.js:61-63);
      - hot keys used in routing predicates are promoted to top-level
        columns (``hdr_sink``, ``content_type``) so the route stays a
        codegen'd column chain — map lookups in a hot predicate would
        still work, but flat columns prune/pushdown better.
    """
    # fold instead of map_from_entries: two keys differing only by case
    # ('Key'/'key') must resolve LAST-WINS like JS object assignment, not
    # crash the task (map_from_entries raises DUPLICATE_MAP_KEY)
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    lowered = F.aggregate(
        F.map_entries(F.col(col)),
        empty,
        lambda acc, e: F.map_concat(
            F.map_filter(acc, lambda k, _v: k != F.lower(e["key"])),
            F.create_map(F.lower(e["key"]), e["value"]),
        ),
    )
    normalized = F.coalesce(lowered, empty)
    return (
        df.withColumn(col, normalized)
        .withColumn(
            "content_type",
            F.coalesce(
                F.element_at(F.col(col), "content-type"), F.lit(_DEFAULT_CONTENT_TYPE)
            ),
        )
        .withColumn("hdr_sink", F.element_at(F.col(col), SINK_OVERRIDE_HEADER))
    )


def set_header(df: DataFrame, key: str, value: Column | str, col: str = "headers") -> DataFrame:
    """setHeader analog (reference: src/core/message.js:89-92): key is
    lowercased, an existing entry is replaced."""
    key = key.lower()
    value = value if isinstance(value, Column) else F.lit(value)
    without = F.map_filter(_headers_or_empty(col), lambda k, _v: k != key)
    return df.withColumn(
        col, F.map_concat(without, F.create_map(F.lit(key), value.cast("string")))
    )


def _headers_or_empty(col: str) -> Column:
    """NULL header map → empty map: mutations must succeed on rows that never
    passed through promote_headers (the reference's message.headers always
    exists, src/core/message.js:56)."""
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    return F.coalesce(F.col(col), empty)


def delete_header(df: DataFrame, key: str, col: str = "headers") -> DataFrame:
    """deleteHeader analog (src/core/message.js deleteHeader)."""
    key = key.lower()
    return df.withColumn(col, F.map_filter(_headers_or_empty(col), lambda k, _v: k != key))


def inc_header(df: DataFrame, key: str, by: int = 1, col: str = "headers") -> DataFrame:
    """incHeader/decHeader analog (src/core/message.js incHeader; the
    queue-retries counter, src/queues/batch.js:232 re-increments on every
    re-batch). The reference THROWS on a missing/non-numeric header; a
    column expression can't throw per-row, so those rows keep a null value
    — filter/dead-letter on ``headers[key] IS NULL`` for the same effect.
    Use a negative ``by`` for decHeader."""
    key = key.lower()
    hdrs = _headers_or_empty(col)
    # try_cast, not cast: under ANSI mode (on in this engine's sessions) a
    # plain cast on a non-numeric header value would kill the job instead of
    # yielding the documented dead-letterable null
    new_val = (F.element_at(hdrs, key).try_cast("long") + F.lit(by)).cast("string")
    without = F.map_filter(hdrs, lambda k, _v: k != key)
    return df.withColumn(col, F.map_concat(without, F.create_map(F.lit(key), new_val)))


def header_override_rule() -> SinkRule:
    """First-priority rule: a message whose headers carry an explicit sink
    goes there, whatever the content says. Prepend to a rule list:
    ``[header_override_rule(), *default_sink_rules()]`` — the sink NAME is
    dynamic per row, so apply_routes special-cases it (see below)."""
    return SinkRule("__header__", F.col("hdr_sink").isNotNull())


def default_sink_rules() -> list[SinkRule]:
    """The demo pipeline's sinks: rule_sink override first (per-message
    routing header analog, reference: src/core/message.js:89-92), then
    lang-based sinks."""
    return [
        SinkRule("hot", F.col("rule_sink") == "hot"),
        SinkRule("commerce", F.col("rule_sink") == "commerce"),
        SinkRule("knowledge", F.col("rule_sink") == "knowledge"),
        SinkRule("media", F.col("rule_sink") == "media"),
        SinkRule("english", F.col("lang_norm") == "en"),
        SinkRule("intl", F.col("lang_norm").isin("fr", "de", "es", "zh", "ja")),
    ]


def apply_routes(df: DataFrame, sinks: list[SinkRule]) -> DataFrame:
    """Add ``status`` and ``sink`` columns.

    Order of precedence (mirrors the reference's per-node event order —
    a reject anywhere upstream wins over downstream delivery):
      1. parse failure          -> rejected / dead_letter
      2. domain rule 'deny'     -> rejected / dead_letter
      3. first matching sink    -> acked / <sink>
      4. no sink matched        -> ignored / null
    """
    rejected = (~F.col("parsed.ok")) | (F.col("rule_action") == "deny")

    sink_expr = F.lit(None).cast("string")
    for rule in reversed(sinks):
        # the header-override rule's sink name is per-row (the header value)
        target = F.col("hdr_sink") if rule.name == "__header__" else F.lit(rule.name)
        sink_expr = F.when(rule.predicate, target).otherwise(sink_expr)

    status = (
        F.when(rejected, F.lit(STATUS_REJECTED))
        .when(sink_expr.isNotNull(), F.lit(STATUS_ACKED))
        .otherwise(F.lit(STATUS_IGNORED))
    )
    sink = F.when(rejected, F.lit(DEAD_LETTER_SINK)).otherwise(sink_expr)
    return df.withColumn("status", status).withColumn("sink", sink)


def apply_routes_broadcast(df: DataFrame, sinks: list[SinkRule]) -> DataFrame:
    """Broadcast-mode dispatch (reference: src/outputs/pipeline.js:18-30,
    ``mode: broadcast``): a row goes to EVERY sink whose predicate matches,
    not just the first. Adds ``sinks: array<string>`` (and the same
    ``status``); the writer filters ``array_contains(sinks, name)`` per sink
    against the one persisted frame — matching k sinks costs k filtered
    passes, not k scans.

    Precedence mirrors :func:`apply_routes`: rejects trump everything and go
    only to the dead-letter sink; zero matches → ignored.
    """
    rejected = (~F.col("parsed.ok")) | (F.col("rule_action") == "deny")
    matched = F.array_compact(
        F.array(
            *[
                F.when(
                    rule.predicate,
                    F.col("hdr_sink") if rule.name == "__header__" else F.lit(rule.name),
                )
                for rule in sinks
            ]
        )
    )
    status = (
        F.when(rejected, F.lit(STATUS_REJECTED))
        .when(F.size(matched) > 0, F.lit(STATUS_ACKED))
        .otherwise(F.lit(STATUS_IGNORED))
    )
    sinks_col = F.when(rejected, F.array(F.lit(DEAD_LETTER_SINK))).otherwise(matched)
    return df.withColumn("status", status).withColumn("sinks", sinks_col)

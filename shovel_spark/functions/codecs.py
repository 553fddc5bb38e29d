"""Codec functions — decoder/encoder slot parity (SURVEY.md §2.2, §2.4).

Shovel's decoders turn ``source`` bytes into structured ``content`` and
encoders do the inverse (reference: src/decoders/*.js, src/encoders/*.js).
Spark-first: every codec that has a built-in stays JVM-side (from_json /
from_csv / unbase64 / ...); the ones needing Python libraries (msgpack,
json5) are Arrow-batched pandas UDFs gated behind import-try — never
row-at-a-time Python.

Schemas are fixed at plan time: shovel's "dynamic" decode is config-time
dynamism too (a given pipeline YAML fixes the shape of content).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- json (reference: src/decoders/json.js:1-15, src/encoders/json.js:13-35)

def decode_json(col: Column, schema) -> Column:
    """bytes/str → struct. Unparseable input → null struct (shovel's handler
    exception ≙ reject; the caller routes null to dead-letter)."""
    return F.from_json(col.cast("string"), schema)


def encode_json(col: Column) -> Column:
    return F.to_json(col)


# --- csv (reference: src/decoders/csv.js:3-53, src/encoders/csv.js:3-53)

def decode_csv(col: Column, schema: str, **options: str) -> Column:
    """One line → struct; delimiter/quote/escape options mirror the
    reference's config surface (src/decoders/csv.js:6-31)."""
    opts = {"sep": options.get("delimiter", ","), **options}
    opts.pop("delimiter", None)
    return F.from_csv(col.cast("string"), schema, opts)


def encode_csv(col: Column, **options: str) -> Column:
    opts = {"sep": options.get("delimiter", ","), **options}
    opts.pop("delimiter", None)
    return F.to_csv(col, opts)


# --- base64 (reference: src/decoders/base64.js:1-15, src/encoders/base64.js)

def decode_base64(col: Column, encoding: str = "UTF-8") -> Column:
    return F.decode(F.unbase64(col), encoding)


def encode_base64(col: Column) -> Column:
    return F.base64(col.cast("binary"))


# --- noop (reference: src/decoders/noop.js, src/encoders/noop.js)

def decode_noop(col: Column) -> Column:
    return col


# --- multiline (reference: src/decoders/multiline.js:1-18 — WIP/broken in
# the reference: it emits an empty message and never joins the stack; here
# the batch form is well-defined: group lines into blank-line-delimited
# blocks and emit one row per block)

def assemble_multiline(df, line_col: str = "line", order_col: str = "id"):
    """Stack consecutive lines until a blank line; one output row per block.

    Batch equivalent of the accumulate-and-flush decoder: a running count of
    blank lines (window cumsum) is the block id — one shuffle, no Python.
    """
    from pyspark.sql import Window

    w = Window.orderBy(order_col)
    block = F.sum(F.when(F.col(line_col) == "", 1).otherwise(0)).over(w)
    return (
        df.withColumn("block_id", block)
        .filter(F.col(line_col) != "")
        .groupBy("block_id")
        .agg(F.concat_ws("\n", F.collect_list(F.col(line_col))).alias("block"))
    )


# --- delimited stream decode: 1 payload → N records (reference:
# src/decoders/protobuf.js:111-141 keeps a cross-message remainder buffer and
# emits N messages per input; the batch equivalent is split + explode — the
# "remainder" problem disappears because a batch row is a complete payload)

def explode_delimited(df, payload_col: str, schema, delimiter: str = "\n", out_col: str = "record"):
    """Split a delimited payload column and decode each piece: the 1→N
    fan-out decode. Blank segments are dropped (framing artifacts); segments
    that fail to decode yield a null struct (dead-letter them downstream,
    per-record error isolation)."""
    pieces = F.explode(
        F.filter(F.split(F.col(payload_col).cast("string"), delimiter), lambda p: p != "")
    ).alias("__piece")
    return df.select("*", pieces).withColumn(
        out_col, F.from_json(F.col("__piece"), schema)
    ).drop("__piece")


# --- msgpack / json5 / protobuf (Python-library codecs, Arrow-batched)

def make_msgpack_decoder(schema):
    """Arrow-batched msgpack decoder (reference: src/decoders/msgpack.js).

    Requires the ``msgpack`` package; raises ImportError at *plan* time if
    absent (never mid-job)."""
    import msgpack  # noqa: F401 — fail fast at plan time

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(schema)
    def decode_msgpack(col: pd.Series) -> pd.DataFrame:
        import msgpack as _m

        records = [None if b is None else _m.unpackb(bytes(b), raw=False) for b in col]
        return pd.DataFrame.from_records(
            [r if isinstance(r, dict) else {} for r in records]
        ).reindex(columns=[f.name for f in schema.fields])

    return decode_msgpack


def make_json5_decoder(schema):
    """json5 decoder (reference: src/decoders/json5.js) — gated on the
    ``json5`` package."""
    import json5  # noqa: F401

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(schema)
    def decode_json5(col: pd.Series) -> pd.DataFrame:
        import json5 as _j

        records = [None if s is None else _j.loads(s) for s in col]
        return pd.DataFrame.from_records(
            [r if isinstance(r, dict) else {} for r in records]
        ).reindex(columns=[f.name for f in schema.fields])

    return decode_json5


def decode_protobuf(col: Column, message_name: str, desc_file_path: str) -> Column:
    """Protobuf decoder (reference: src/decoders/protobuf.js:12-142) via
    spark-protobuf — requires the spark-protobuf package on the classpath
    (not bundled in this sandbox; the call surface is the contract)."""
    from pyspark.sql.protobuf.functions import from_protobuf

    return from_protobuf(col, message_name, desc_file_path)


# --- content-type (reference: src/core/utils.js:69-72 parseContentType;
# default application/octet-stream, src/core/message.js:4)

def parse_content_type(col: Column) -> Column:
    """'text/html; charset=utf-8' → struct(mime, params map) — the header
    parse that picks decoders in the reference."""
    mime = F.lower(F.trim(F.regexp_extract(col, r"^([^;]+)", 1)))
    mime = F.when(mime == "", "application/octet-stream").otherwise(mime)
    return F.struct(
        mime.alias("mime"),
        F.map_from_entries(
            F.filter(
                F.transform(
                    F.slice(F.split(F.coalesce(col, F.lit("")), ";"), 2, 100),
                    lambda p: F.struct(
                        F.lower(F.trim(F.element_at(F.split(p, "="), 1))).alias("key"),
                        F.trim(F.element_at(F.split(p, "="), 2)).alias("value"),
                    ),
                ),
                lambda e: (e["key"] != "") & e["value"].isNotNull(),
            )
        ).alias("params"),
    )


# --- format / template (reference: src/encoders/format.js:1-15,
# renderTemplate src/core/utils.js:45-67)

#: date tokens supported by the reference's renderTemplate
#: (src/core/utils.js:49-64) → Spark date_format patterns.
_DATE_TOKENS = {
    "YYYY": "yyyy",
    "YY": "yy",
    "MM": "MM",
    "M": "M",
    "DD": "dd",
    "D": "d",
    "HH": "HH",
    "H": "H",
    "mm": "mm",
    "m": "m",
    "ss": "ss",
    "s": "s",
}

_PLACEHOLDER = re.compile(r"\{([A-Za-z_][\w.]*)\}")


def render_template(template: str, date_col: Column | str | None = None, **fields: Column) -> Column:
    """``'audit-{type}-{YYYY}-{MM}'`` → concat of lits, field cols, and
    date parts — compiled once at plan time, zero per-row interpretation.

    Mirrors renderTemplate's contract: ``{field}`` from the row, date tokens
    from the event date (UTC), e.g. the elasticsearch output's dynamic index
    name (reference: src/outputs/elasticsearch.js:203-210).
    """
    date_col = F.col(date_col) if isinstance(date_col, str) else date_col
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        token = m.group(1)
        if token in _DATE_TOKENS:
            if date_col is None:
                raise ValueError(f"template uses date token {{{token}}} but no date_col given")
            parts.append(F.date_format(date_col, _DATE_TOKENS[token]))
        elif token == "T":
            parts.append(F.unix_millis(date_col).cast("string"))
        elif token == "DATE_ISO":
            parts.append(F.date_format(date_col, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"))
        elif token in fields:
            parts.append(fields[token].cast("string"))
        else:
            parts.append(F.col(token).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")

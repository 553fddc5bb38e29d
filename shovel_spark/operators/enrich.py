"""Enrichment — the pipeline-slot analog (SURVEY.md §2.3).

Shovel exposes ``util.translate(value, dict, defaultValue)`` to user pipeline
code (reference: src/core/utils.js:74-76) — a dictionary lookup. The
Spark-native equivalent is a broadcast hash join against a tiny dim table
with ``coalesce`` for the default: no shuffle of the fact side, safe at any
fact-table scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def translate(
    df: DataFrame,
    key_col: str,
    mapping: DataFrame,
    map_key: str,
    map_value: str,
    out_col: str,
    default: Column | str | None = None,
) -> DataFrame:
    """Broadcast-join dictionary lookup with default fall-through.

    Mirrors ``util.translate``'s semantics: missing key -> ``default``
    (reference: src/core/utils.js:74-76). The mapping side is always
    broadcast — it is a config-sized dict, never data-sized.
    """
    lkp = F.broadcast(
        mapping.select(F.col(map_key).alias("__k"), F.col(map_value).alias("__v")).dropDuplicates(["__k"])
    )
    joined = df.join(lkp, df[key_col] == lkp["__k"], "left")
    if default is None:
        value = F.col("__v")
    elif isinstance(default, Column):
        value = F.coalesce(F.col("__v"), default)
    else:
        value = F.coalesce(F.col("__v"), F.lit(default))
    return joined.withColumn(out_col, value).drop("__k", "__v")


def normalize_lang(
    df: DataFrame, lang_map: DataFrame, out_col: str = "lang_norm", default: str = "und"
) -> DataFrame:
    """lang raw -> normalized code, unknown/empty -> ``default`` ('und'
    unless the pipeline config sets lang_default; driver-mandated lang-map
    broadcast join, BASELINE.json north_star)."""
    return translate(df, "lang", lang_map, "lang_raw", "lang_norm", out_col, default=default)


def apply_domain_rules(df: DataFrame, rules: DataFrame) -> DataFrame:
    """Attach ``rule_action`` / ``rule_sink`` from the domain allow/deny list.

    Deny ≙ shovel reject (reference: src/core/processor.js:140-144);
    unlisted domain ≙ default-allow (null action coalesced downstream).
    """
    lkp = F.broadcast(
        rules.select(
            F.col("domain").alias("__d"),
            F.col("action").alias("rule_action"),
            F.col("sink").alias("rule_sink"),
        ).dropDuplicates(["__d"])
    )
    return df.join(lkp, df["domain"] == lkp["__d"], "left").drop("__d")

"""Snapshot upsert-merge for recurring crawls — keep-latest-per-key.

A crawl pipeline re-fetches pages: merging a new snapshot into the corpus
must keep exactly one row per URL (the freshest), never duplicate, and be
deterministic under ties — the batch analog of Iceberg's MERGE INTO, and
the same delivery contract as the reference's ack-once routing
(reference: src/core/processor.js ack semantics — a message is delivered
to a sink exactly once; here a URL survives a merge exactly once).

Scale shape: union + ONE key-shuffle. The rank-1 window compiles to
WindowGroupLimit (per-partition top-1 before the shuffle), so each key
ships at most one row per input partition — a URL re-crawled a thousand
times never concentrates its history on one reducer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(
    old: DataFrame,
    new: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: Column | str | None = None,
) -> DataFrame:
    """Merge ``new`` into ``old``: one row per ``key``, the one with the
    greatest ``ts_col``. Equal timestamps prefer the NEW snapshot (an
    idempotent re-run of the same snapshot is a no-op). Ties beyond
    (ts, origin) keep a single row but an ARBITRARY one — pass a
    ``tiebreak`` column (ascending; must differ within the partition, not
    the key itself) whenever one snapshot may carry duplicate keys, to
    make the order total and the survivor deterministic.

    Both inputs must have the SAME column set (columns beyond key/ts are
    fine when present on both sides; unionByName rejects asymmetry).
    NULL timestamps sort last (a row without a fetch time never beats a
    dated row).
    """
    tagged = old.withColumn("__origin", F.lit(0)).unionByName(
        new.withColumn("__origin", F.lit(1))
    )
    order = [F.col(ts_col).desc_nulls_last(), F.col("__origin").desc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc() if isinstance(tiebreak, str) else tiebreak)
    w = Window.partitionBy(key).orderBy(*order)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__origin")
    )

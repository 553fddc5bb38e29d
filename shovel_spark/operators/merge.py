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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fingerprint: Column | str,
) -> DataFrame:
    """Crawl-delta report: (key, status) for every key in either snapshot —
    ``added`` (new only), ``removed`` (old only), ``changed`` (both, but
    the content fingerprint differs), ``unchanged``. The crawl-ops
    companion to :func:`upsert_latest`: the merge writes the new corpus,
    the diff tells you WHAT the re-crawl actually did (refresh rates,
    churn per domain, dead links).

    ``fingerprint`` is evaluated against each side (e.g.
    ``F.md5("text")`` or an existing digest column). Inputs must be
    one-row-per-key (run upsert/dedup first). Shape: one full-outer
    equi-join on the key — fingerprints shuffle, never content.
    """
    fp = F.col(fingerprint) if isinstance(fingerprint, str) else fingerprint
    # explicit presence flags: a NULL FINGERPRINT on a present row must not
    # masquerade as an absent key (NULL fp vs NULL fp is 'unchanged')
    o = old.select(F.col(key).alias("__k"), fp.alias("__fo"), F.lit(True).alias("__po"))
    n = new.select(F.col(key).alias("__k"), fp.alias("__fn"), F.lit(True).alias("__pn"))
    joined = o.join(n, "__k", "full_outer")
    status = (
        F.when(F.col("__po").isNull(), F.lit("added"))
        .when(F.col("__pn").isNull(), F.lit("removed"))
        .when(F.col("__fo").eqNullSafe(F.col("__fn")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(F.col("__k").alias(key), status.alias("status"))

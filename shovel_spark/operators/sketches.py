"""Count-min sketch + heavy hitters, from scratch on DataFrames.

The reference keeps per-node/per-sink counters in memory and merges them
across workers (reference: src/core/aggregated_metrics.js:100-132); exact
per-KEY counts at web scale (per-domain, per-user) are a different beast —
the key space is unbounded and a hot-key groupBy is the classic skew wound.
A count-min sketch bounds the state at ``depth * width`` cells no matter the
cardinality, overestimates only (never undercounts), and merges by cell-wise
addition — the mergeable-summary property that makes it the streaming/
cross-worker counter of choice.

Engine-neutral hashing: bucket = int(md5("cm{row}:" || key)[:8 hex]) % width
— the same arithmetic is expressible in any SQL engine, so an external
oracle can replay the ENTIRE sketch (cells, estimates, heavy-hitter
election) exactly; nothing here is "approximately tested".

Scale shape: building is one explode(depth) + map-side-combinable groupBy —
the shuffle carries at most depth*width partial cells per map task,
REGARDLESS of key skew (the hot key folds into its cell map-side: the
sketch is itself the skew defense). Estimation joins candidate keys against
the depth*width cell table (broadcastable at any realistic width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in hash row ``row`` — md5-derived so any engine
    reproduces it: first 8 hex chars as an unsigned int, mod width."""
    h = F.md5(F.concat(F.lit(f"cm{row}:"), key))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width).alias("bucket")


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, bucket, c) — the sketch's non-zero cells (at most depth*width
    rows). One pass: each input row contributes ``depth`` (row, bucket)
    increments via a single explode; the groupBy pre-aggregates map-side,
    so a hot key never shuffles more than depth cells per task."""
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cm_bucket(k, r, width))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("__c"))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(key, est) for each candidate key: min over the key's depth cells —
    the count-min estimate, >= the true count always (collisions only add).
    The sketch side is depth*width rows — broadcast it."""
    k = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), cm_bucket(k, r, width))
                    for r in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(key_col, F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_frac: float = 0.01,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est, exact) for every key whose ESTIMATE reaches
    ``min_frac`` of the total row count — count-min's no-false-negative
    guarantee means every true heavy hitter surfaces (some near-threshold
    keys may ride in on collisions; the exact column, one extra groupBy
    over the already-shortlisted keys, settles them).

    Two passes, both skew-proof: build the sketch (bounded shuffle), then
    estimate over distinct keys and keep the shortlist. The exact
    recount touches only shortlisted keys (semi-join pushdown)."""
    sketch = count_min_build(df, key_col, depth, width)
    total = df.count()
    threshold = int(total * min_frac)
    cands = cm_estimate(sketch, df.select(key_col).distinct(), key_col, depth, width)
    hot = cands.filter(F.col("est") >= threshold)
    exact = (
        df.join(F.broadcast(hot.select(key_col)), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("exact"))
    )
    return hot.join(exact, key_col).select(key_col, "est", "exact")

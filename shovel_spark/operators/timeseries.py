"""Time-series resampling with gap filling.

Log/metric pipelines downsample event streams into fixed buckets; a naive
groupBy silently DROPS empty buckets, so downstream rate math (deltas,
moving averages, alerting) sees a shorter series instead of zeros. This
operator emits a DENSE per-key bucket grid.

Scale shape: the aggregation is an ordinary groupBy (map-side partial
combine); the dense grid comes from per-key (min, max) bucket bounds —
one tiny row per key — exploded into bucket timestamps and left-joined
back. The explode produces |keys| x |buckets| rows, which IS the output
size; nothing intermediate exceeds it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    interval_seconds: int = 3600,
    aggs: dict[str, Column] | None = None,
    fill: dict[str, float] | None = None,
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """Downsample to ``interval_seconds`` buckets per key, emitting EVERY
    bucket between each key's first and last event (empty buckets filled
    from ``fill``, default 0 for counts / NULL otherwise).

    ``aggs`` maps output column name -> aggregate Column (default
    ``{"n": count(*)}``); ``fill`` maps output column name -> value for
    empty buckets.
    """
    aggs = aggs or {"n": F.count("*")}
    fill = fill or {"n": 0}
    # floor, NOT cast-to-long: cast truncates toward zero, so a pre-1970
    # timestamp would land in the bucket AFTER the event. Seconds come from
    # floor(unix_micros/1e6), not unix_timestamp: unix_timestamp TRUNCATES
    # fractional seconds (rounding-direction mismatch vs engines that round
    # epoch()), while floor-of-micros buckets a fractional pre-boundary
    # timestamp identically everywhere.
    seconds = F.floor(
        F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000000)
    )
    bucket = (
        F.floor(seconds / interval_seconds).cast("long") * interval_seconds
    )
    agg = (
        df.withColumn("__b", bucket)
        .groupBy(*key_cols, "__b")
        .agg(*[a.alias(name) for name, a in aggs.items()])
    )
    bounds = agg.groupBy(*key_cols).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(interval_seconds))
        ).alias("__b"),
    )
    out = grid.join(agg, [*key_cols, "__b"], "left")
    for name in aggs:
        if name in fill:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(fill[name])))
    return out.withColumn(bucket_col, F.timestamp_seconds(F.col("__b"))).drop("__b")

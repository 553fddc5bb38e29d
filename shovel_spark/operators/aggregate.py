"""Aggregations — shovel's monotone counters + driver-mandated skew-safe counts.

The reference only counts messages per node/kind (reference:
src/core/node.js:284-289, src/core/processor.js:26-37); its end-of-run totals
``{workers,in,acked,nacked,ignored,rejected}`` (reference:
src/core/master.js:183-185) are the golden metrics shape here.

Per-domain / per-lang counts are driver-mandated (BASELINE.json north_star)
with **salting**: a hot domain (~20% of 10^12 rows) would hammer one reducer;
the two-phase salted aggregate bounds any single task at 1/K of the hot key.
Note Spark's hash aggregate already does map-side partial aggregation, which
usually suffices for counts — salting is the belt-and-braces path for
extreme skew and is property-tested equal to the naive groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salt_buckets: int = 32, out_col: str = "n") -> DataFrame:
    """Two-phase count: groupBy(key, salt) partial -> groupBy(key) final."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = df.groupBy(F.col(key), salt.alias("__salt")).count()
    return partial.groupBy(key).agg(F.sum("count").alias(out_col))


def sink_metrics(routed: DataFrame, pipeline: str = "pages") -> DataFrame:
    """Per-sink + pipeline-total metrics rows (METRICS_SCHEMA shape).

    One shuffle over (status, sink) counts — the counts are tiny after the
    map-side partial agg, so the rollup to totals happens on <100 rows.
    """
    per = (
        routed.groupBy("sink", "status")
        .count()
        .filter(F.col("sink").isNotNull())  # ignored rows have no sink; they
        # appear only in the pipeline-total row (sink=null), avoiding an
        # ambiguous second null-sink row.
        .groupBy("sink")
        .agg(
            F.sum("count").alias("in_rows"),
            F.sum(F.when(F.col("status") == "acked", F.col("count")).otherwise(0)).alias("acked"),
            F.lit(0).cast("long").alias("nacked"),
            F.sum(F.when(F.col("status") == "ignored", F.col("count")).otherwise(0)).alias("ignored"),
            F.sum(F.when(F.col("status") == "rejected", F.col("count")).otherwise(0)).alias("rejected"),
        )
        .withColumn("pipeline", F.lit(pipeline))
    )
    total = routed.agg(
        F.lit(pipeline).alias("pipeline"),
        F.lit(None).cast("string").alias("sink"),
        F.count("*").alias("in_rows"),
        F.sum(F.when(F.col("status") == "acked", 1).otherwise(0)).cast("long").alias("acked"),
        F.lit(0).cast("long").alias("nacked"),
        F.sum(F.when(F.col("status") == "ignored", 1).otherwise(0)).cast("long").alias("ignored"),
        F.sum(F.when(F.col("status") == "rejected", 1).otherwise(0)).cast("long").alias("rejected"),
    )
    cols = ["pipeline", "sink", "in_rows", "acked", "nacked", "ignored", "rejected"]
    return per.select(*cols).unionByName(total.select(*cols))


def cohort_retention(
    df,
    key_col: str = "user_id",
    signup_type: str = "signup",
    type_col: str = "event_type",
    ts_col: str = "ts",
    days: list[int] | None = None,
):
    """Cohort retention — the other classic log-pipeline conversion table
    (sibling of windows.funnel_times): users grouped by their signup DAY
    (first ``signup_type`` event), and for each offset in ``days``, how
    many were active (ANY event) exactly that many days later.

    Day buckets come from floor(epoch seconds / 86400) — floor, not cast,
    so fractional seconds and pre-epoch times bucket identically across
    engines (the operators/timeseries.resample convention).

    Output: (cohort_day: date, n_users, retained_d<1>, ...). Scale shape:
    one groupBy(key) for signup days, one distinct over (key, day) —
    map-side combined, a user's events collapse to their distinct active
    days before any join — one key-join, one flags groupBy(key), one
    cohort groupBy. No windows, no event-stream sort.
    """
    from pyspark.sql import functions as F

    days = days if days is not None else [1, 7]
    day = F.floor(
        F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1000000))
        / F.lit(86400)
    )
    signups = (
        df.filter(F.col(type_col) == signup_type)
        .groupBy(key_col)
        .agg(F.min(day).alias("__d0"))
    )
    activity = df.select(F.col(key_col), day.alias("__d")).distinct()
    offsets = signups.join(activity, key_col).select(
        key_col, "__d0", (F.col("__d") - F.col("__d0")).alias("__off")
    )
    flags = offsets.groupBy(key_col, "__d0").agg(
        *[
            F.max(F.when(F.col("__off") == n, 1).otherwise(0)).alias(f"__r{n}")
            for n in days
        ]
    )
    return flags.groupBy(
        F.date_from_unix_date(F.col("__d0").cast("int")).alias("cohort_day")
    ).agg(
        F.count("*").alias("n_users"),
        *[F.sum(f"__r{n}").alias(f"retained_d{n}") for n in days],
    )

"""Approximate aggregates: accuracy guard vs exact values."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_distinct_and_quantiles_accuracy(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.expr("percentile(value, 0.5)").alias("p50_exact"),
        )
        .collect()
    }
    for et, r in got.items():
        assert abs(r["approx_users"] - r["exact_users"]) <= max(2, 0.05 * r["exact_users"]), et
        assert abs(r["p50_approx"] - r["p50_exact"]) <= 1.0, et

"""AQE skew handling: a pathologically hot join key gets split at runtime
(SURVEY.md §4.2 — the reference has no skew handling at all; a hot AMQP
queue just backs up)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 95% of left rows share one key; right side is uniform
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("x"), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = left.join(right, "k")
        # collect() executes THIS frame's own QueryExecution (count()/write()
        # spawn new ones whose final plan we can't read back)
        assert len(j.collect()) == 200_000
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "skew=true" in final  # AQE rewrote the hot partition into splits
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)

"""Z-order layout: Morton key correctness + the clustering property that
makes min/max file stats prune on either dimension."""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.operators.layout import zorder_key, zorder_layout


def test_zorder_key_interleaves_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = {
        (r.a, r.b): r.z
        for r in rows.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    }

    def py_morton(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    for (a, b), z in got.items():
        assert z == py_morton(a, b), (a, b, z)
    assert got[(1, 0)] == 1 and got[(0, 1)] == 2  # bit placement


def test_zorder_layout_shrinks_per_partition_bounding_boxes(spark):
    """After Z-order range-clustering, each partition covers a small
    bounding box in (a, b) space — the property min/max stats pruning
    needs. Compare mean per-partition box area against the global area."""
    import random

    rnd = random.Random(7)
    rows = [(rnd.randrange(4096), rnd.randrange(4096)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "a long, b long").repartition(16)
    clustered = zorder_layout(df, "a", "b", n_ranges=16, bits=12)
    stats = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("a") - F.min("a")).alias("da"),
            (F.max("b") - F.min("b")).alias("db"),
        )
        .collect()
    )
    areas = [r.da * r.db for r in stats if r.da is not None]
    mean_area = sum(areas) / len(areas)
    global_area = 4096 * 4096
    # 16 Z-ranges over a 2-D uniform square → each range covers ~1/16 of
    # the area; allow generous slack for ragged Z-curve boundaries
    assert mean_area < global_area / 3, (mean_area, global_area)

"""Compaction planning: bin arithmetic, oversized files, manifest walk."""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.operators.maintenance import (
    compaction_plan,
    compaction_summary,
    list_parquet_files,
)


def test_compaction_bins_hand_computed(spark):
    """target=100: sizes 90,60,50,40 (desc) cut at running-sum-before
    0,90,150,200 -> bins 0,0,1,2."""
    files = spark.createDataFrame(
        [("p", "a", 90), ("p", "b", 60), ("p", "c", 50), ("p", "d", 40)],
        "partition string, file string, bytes long",
    )
    plan = {r.file: r.bin for r in compaction_plan(files, 100).collect()}
    assert plan == {"a": 0, "b": 0, "c": 1, "d": 2}
    s = compaction_summary(compaction_plan(files, 100)).first()
    assert (s.n_files, s.n_bins, s.bytes_total) == (4, 3, 240)


def test_oversized_file_gets_own_bin_and_partitions_isolate(spark):
    files = spark.createDataFrame(
        [("p1", "huge", 500), ("p1", "s1", 10), ("p1", "s2", 10),
         ("p2", "x", 10)],
        "partition string, file string, bytes long",
    )
    plan = {(r.partition, r.file): r.bin for r in compaction_plan(files, 100).collect()}
    assert plan[("p1", "huge")] == 0
    # the small files start AFTER the huge file's bins (500/100 = 5)
    assert plan[("p1", "s1")] == 5 and plan[("p1", "s2")] == 5
    assert plan[("p2", "x")] == 0  # independent partition numbering


def test_list_parquet_files_matches_disk(spark, tmp_path):
    out = str(tmp_path / "t")
    spark.range(100).withColumn("p", F.col("id") % 2).write.partitionBy(
        "p"
    ).parquet(out)
    manifest = list_parquet_files(spark, out)
    rows = manifest.collect()
    assert all(r.file.endswith(".parquet") and r.bytes > 0 for r in rows)
    assert {r.partition.split("/")[0] for r in rows} == {"p=0", "p=1"}
    # planning over a real manifest runs end-to-end
    assert compaction_plan(manifest, 10_000).count() == len(rows)

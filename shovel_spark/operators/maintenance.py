"""Table maintenance — small-file compaction planning.

Every incremental writer in this repo (streaming near-dup ingest,
sketch-register batches, ledger-bucketed pipeline output) creates one
parquet file set per micro-batch/bucket — exactly how a 100 TB table
accumulates millions of small files until scans drown in open() overhead.
The lakehouse answer (Iceberg/Delta OPTIMIZE) is a compaction pass; this
operator is its PLANNING half, as a DataFrame over the file manifest:
group each partition's files into target-sized bins so the rewrite job
knows which files to coalesce together.

Binning rule (deterministic, engine-neutral): within a partition, order
files largest-first (classic first-fit-decreasing order, which keeps big
files from fragmenting bins), then cut bins by running size:
bin = floor((cumsum - size) / target) — i.e. a file starts a new bin
when the bytes before it already fill previous bins. Next-fit on the
sorted order ≈ FFD within a couple percent, and unlike true FFD it needs
no sequential state — one window per partition, bounded by that
partition's file count.

Scale shape: the manifest is file-metadata-sized (name, bytes), orders
of magnitude smaller than the data; the only window partitions by table
partition. The plan's consumers rewrite each bin with
``coalesce(1)``-per-bin jobs or hand the grouping to a table format's
rewrite action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "partition",
    file_col: str = "file",
    size_col: str = "bytes",
) -> DataFrame:
    """(partition, file, bytes, bin) — which files to rewrite together.

    Files at or above ``target_bytes`` land alone in their bin by
    construction (their own size fills it). Ordering is (bytes desc,
    file) so the plan is total-order deterministic and replayable."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col(size_col).desc(), F.col(file_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(size_col).over(w)
    return files.select(
        partition_col,
        file_col,
        size_col,
        F.floor((cum - F.col(size_col)) / F.lit(float(target_bytes)))
        .cast("long")
        .alias("bin"),
    )


def compaction_summary(plan: DataFrame, partition_col: str = "partition") -> DataFrame:
    """(partition, n_files, n_bins, bytes_total) — the before/after file
    counts the maintenance job reports; one bounded groupBy."""
    return plan.groupBy(partition_col).agg(
        F.count("*").alias("n_files"),
        F.count_distinct("bin").alias("n_bins"),
        F.sum("bytes").alias("bytes_total"),
    )


def list_parquet_files(spark, path: str, partition_col_name: str = "partition"):
    """Manifest of a (possibly partitioned) parquet directory as a
    DataFrame: (partition, file, bytes). Driver-side directory walk —
    bounded by file COUNT, carrying ~100 bytes per file; for table
    formats, read the manifest/metadata tables instead."""
    import os

    rows = []
    for root, _dirs, names in os.walk(path):
        part = os.path.relpath(root, path)
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(root, n)
                rows.append((part if part != "." else "", n, os.path.getsize(p)))
    return local_rows_df(
        spark, rows, f"{partition_col_name} string, file string, bytes long"
    )

"""Checkpoint ledger + resumable runner — the queues/batch analog.

Shovel persists queued messages to LevelDB keyed by uuid and replays unacked
ones on restart (reference: src/queues/batch.js:61-98, replay :84-95), with a
``queue-stored`` dedupe header so the broker ack fires exactly once
(reference: src/queues/batch.js:149-155). The batch equivalent:

  - rows are assigned a **stable logical bucket** ``pmod(xxhash64(url), B)``
    — independent of physical file layout, so the same row lands in the same
    bucket on every run at any parallelism;
  - all sink/metrics writes are **partitioned by bucket** with dynamic
    partition overwrite — re-processing a bucket *replaces* its output
    instead of appending (the dedupe-header analog: no double-routing);
  - after a bucket's outputs commit, one ledger row
    ``(run_id, bucket, status='done', counts, lineage)`` is appended — the
    ack. A killed run resumes by skipping buckets with a ledger row
    (the replay-of-unacked analog: no reprocessing).

Crash window analysis: if the run dies after sink writes but before the
ledger append, the bucket is *not* done → the resume re-runs it and the
dynamic overwrite replaces the partial output. If it dies after the ledger
append, the bucket is done and skipped. Either way: exactly-once output.

At 10^12 rows the bucket count B is the checkpoint granularity knob —
B ≈ cluster-cores × small-constant keeps each resume unit large enough to
amortize job overhead while losing at most 1/B of work on a crash.
"""

from __future__ import annotations

import os
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shovel_spark.schema import LEDGER_SCHEMA
from shovel_spark.session import local_rows_df


def with_bucket(df: DataFrame, key: str = "url", n_buckets: int = 64) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def read_done_buckets(spark: SparkSession, ledger_dir: str) -> set[int]:
    if not os.path.exists(ledger_dir):
        return set()
    rows = (
        spark.read.schema(LEDGER_SCHEMA)
        .parquet(ledger_dir)
        .filter(F.col("status") == "done")
        .select("bucket")
        .distinct()
        .collect()
    )
    return {r.bucket for r in rows}


def append_ledger(
    spark: SparkSession,
    ledger_dir: str,
    run_id: str,
    bucket_counts: list[dict],
    lineage: str,
) -> None:
    """One 'done' row per completed bucket — the commit point (the ack)."""
    rows = [
        (
            run_id,
            int(bc["bucket"]),
            "done",
            int(bc["in_rows"]),
            int(bc["acked"]),
            0,
            int(bc["ignored"]),
            int(bc["rejected"]),
            lineage,
            None,
        )
        for bc in bucket_counts
    ]
    df = local_rows_df(spark, rows, LEDGER_SCHEMA).withColumn(
        "completed_at", F.current_timestamp()
    )
    df.write.mode("append").parquet(ledger_dir)


def append_attempts(
    spark: SparkSession, ledger_dir: str, run_id: str, buckets: list[int]
) -> None:
    """One 'attempt' row per bucket this run INTENDS to process — the
    delivery record (the ack is the 'done' row). A bucket that crashes
    between attempt and done is re-attempted by the resume, so its nack
    count is ``attempts - 1`` — the batch analog of a broker redelivery
    (shovel counts these per worker, reference: src/core/master.js:183-185).

    Buckets that turn out to hold no rows accumulate attempt rows but never
    a done row; metrics_from_ledger ignores them (nacked is only reported
    for acked buckets, like a broker only counts redeliveries of real
    messages)."""
    if not buckets:
        return
    rows = [(run_id, int(b), "attempt", 0, 0, 0, 0, 0, None, None) for b in buckets]
    df = local_rows_df(spark, rows, LEDGER_SCHEMA).withColumn(
        "completed_at", F.current_timestamp()
    )
    df.write.mode("append").parquet(ledger_dir)


def new_run_id() -> str:
    return _uuid.uuid4().hex[:12]

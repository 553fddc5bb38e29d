"""applyInPandasWithState sessionization: accumulate per-key state across
micro-batches, emit on processing-time timeout.

Note: availableNow triggers never terminate while stateful timeouts exist
(the engine keeps scheduling 'cleaning up state' batches), so the test runs
a continuous micro-batch query and polls the memory sink.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from shovel_spark.streaming.stateful import sessionize_stream


def _poll(spark, table, predicate, timeout_s=60):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if predicate(rows):
            return rows
        time.sleep(0.5)
    pytest.fail(f"timed out waiting for {table}: {spark.sql(f'SELECT * FROM {table}').collect()}")


def test_sessions_emit_on_timeout(spark, tmp_path):
    in_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")

    ev1 = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:05:00"), (2, "2024-01-01 11:00:00")],
        "user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev1.write.mode("append").parquet(in_dir)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(in_dir)
    sessions = sessionize_stream(stream, gap_ms=1500)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        rows = _poll(spark, "sess", lambda r: len(r) >= 2)
        got = {r.user_id: r for r in rows}
        assert set(got) == {1, 2}
        assert got[1].n_events == 2
        assert str(got[1].session_start) == "2024-01-01 10:00:00"
        assert str(got[1].session_end) == "2024-01-01 10:05:00"
        assert got[2].n_events == 1

        # a later event for user 1 opens a FRESH session (state was removed)
        ev2 = spark.createDataFrame([(1, "2024-01-01 12:00:00")], "user_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        ev2.write.mode("append").parquet(in_dir)
        rows = _poll(spark, "sess", lambda r: len(r) >= 3)
        second = [r for r in rows if r.user_id == 1 and str(r.session_start) == "2024-01-01 12:00:00"]
        assert len(second) == 1 and second[0].n_events == 1
    finally:
        q.stop()

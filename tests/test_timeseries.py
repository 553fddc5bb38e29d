"""operators/timeseries.resample — dense bucket grid with gap filling."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from shovel_spark.operators.timeseries import resample


def test_resample_fills_gaps_with_zeros(spark):
    """A key with events in buckets 0 and 2 must emit bucket 1 as an
    explicit zero row; keys never overlap; sums land in the right bucket."""
    rows = [
        (1, datetime(2024, 1, 1, 0, 5), 10.0),
        (1, datetime(2024, 1, 1, 0, 20), 5.0),
        (1, datetime(2024, 1, 1, 2, 1), 7.0),   # hour 1 is a gap
        (2, datetime(2024, 1, 1, 3, 0), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample(
        df, ["user_id"], interval_seconds=3600,
        aggs={"n": F.count("*"), "total": F.sum("value")},
        fill={"n": 0, "total": 0.0},
    )
    got = {(r.user_id, r.bucket_ts.hour): (r.n, r.total) for r in out.collect()}
    assert got == {
        (1, 0): (2, 15.0),
        (1, 1): (0, 0.0),   # the gap, explicitly zero
        (1, 2): (1, 7.0),
        (2, 3): (1, 1.0),   # single-bucket key: exactly one row, no spill-over
    }


def test_resample_pre_epoch_buckets_floor(spark):
    """Negative epoch seconds must FLOOR into the bucket containing the
    event (cast-to-long truncates toward zero and would shift pre-1970
    events into the following bucket)."""
    df = spark.createDataFrame(
        [(1, datetime(1969, 12, 31, 23, 0)), (1, datetime(1970, 1, 1, 1, 0))],
        "k long, ts timestamp",
    )
    out = {r.bucket_ts: r.n for r in resample(df, ["k"], interval_seconds=86400).collect()}
    assert out == {datetime(1969, 12, 31): 1, datetime(1970, 1, 1): 1}


def test_resample_default_count(spark):
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 0, 0)), (1, datetime(2024, 1, 1, 0, 30))],
        "k long, ts timestamp",
    )
    out = resample(df, ["k"], interval_seconds=3600).collect()
    assert len(out) == 1 and out[0].n == 2


def test_resample_fractional_seconds_truncate(spark):
    """A timestamp with fractional seconds >= .5 just below a bucket
    boundary must stay in the bucket CONTAINING it (floor semantics), not
    round up across the boundary — cross-engine parity with oracles that
    compute floor(epoch(ts))."""
    from datetime import datetime as dt

    rows = [
        (1, dt(2024, 1, 1, 0, 59, 59, 900000), 1.0),  # 0:59:59.9 → hour 0
        (1, dt(2024, 1, 1, 1, 0, 0, 400000), 2.0),    # 1:00:00.4 → hour 1
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = resample(df, ["user_id"], interval_seconds=3600,
                   aggs={"total": F.sum("value")}, fill={"total": 0.0})
    got = {r.bucket_ts.hour: r.total for r in out.collect()}
    assert got == {0: 1.0, 1: 2.0}

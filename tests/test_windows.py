"""operators/windows.py — sessionize and as-of join semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from shovel_spark.operators import windows


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_sessionize_gap_boundaries(spark):
    """Exactly-at-gap events stay in the session; one microsecond past the
    gap starts a new one. Ids are 1-based and contiguous per key."""
    rows = [
        (1, 1, _ts("2024-01-01T10:00:00")),
        (1, 2, _ts("2024-01-01T10:30:00")),          # gap == 1800s -> same session
        (1, 3, _ts("2024-01-01T11:00:00.000001")),   # 1800.000001s -> new session
        (2, 4, _ts("2024-01-01T09:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in windows.sessionize(df, ["user_id"], order_cols=["event_id"]).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_sessionize_single_shuffle(spark):
    """lag and the cumulative sum share one Window partitioning — exactly
    one Exchange in the plan."""
    df = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
    )
    plan = (
        windows.sessionize(df, ["user_id"], order_cols=["event_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_asof_join_matches_pandas_merge_asof(spark):
    """Backward as-of semantics verified against pandas merge_asof over
    deterministic pseudo-random data with ties, missing keys, and
    out-of-order input."""
    import pandas as pd

    left = [
        (u, i, _ts(f"2024-01-01T{h:02d}:{m:02d}:00"))
        for i, (u, h, m) in enumerate(
            [(1, 10, 0), (1, 10, 30), (1, 9, 0), (2, 12, 0), (3, 8, 0), (2, 11, 59)]
        )
    ]
    right = [
        (1, _ts("2024-01-01T09:00:00"), 100.0),   # exact tie with a left row
        (1, _ts("2024-01-01T10:15:00"), 110.0),
        (2, _ts("2024-01-01T11:59:00"), 200.0),   # exact tie
        (2, _ts("2024-01-01T13:00:00"), 210.0),   # after every left row
        # user 3 has no right rows at all
    ]
    ldf = spark.createDataFrame(left, "user_id long, event_id long, ts timestamp")
    rdf = spark.createDataFrame(right, "user_id long, ts timestamp, price double")

    got = {
        r.event_id: (r.price, r.ts_asof)
        for r in windows.asof_join(ldf, rdf, on=["user_id"]).collect()
    }

    lpd = pd.DataFrame(left, columns=["user_id", "event_id", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(right, columns=["user_id", "ts", "price"]).sort_values("ts")
    merged = pd.merge_asof(lpd, rpd, on="ts", by="user_id", direction="backward")
    for _, row in merged.iterrows():
        price, ts_asof = got[row.event_id]
        if pd.isna(row.price):
            assert price is None and ts_asof is None
        else:
            assert price == row.price
    assert len(got) == len(left)  # every left row survives (left-join shape)


def test_asof_join_matches_rows_atomically(spark):
    """A NULL value in the LATEST preceding right row must come through as
    NULL — not resurrect that column from an older right row stitched onto
    the newer row's other columns (the whole right row matches or none of
    it; pandas merge_asof semantics)."""
    ldf = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:30:00"))], "user_id long, event_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 100.0, "a"),
            (1, _ts("2024-01-01T10:00:00"), None, "b"),
        ],
        "user_id long, ts timestamp, price double, tag string",
    )
    row = windows.asof_join(ldf, rdf, on=["user_id"]).first()
    assert row.tag == "b" and row.price is None  # NOT 100.0 from the older row
    assert row.ts_asof == _ts("2024-01-01T10:00:00")


def test_asof_join_equal_ts_right_rows_deterministic(spark):
    """Two right rows sharing (key, ts): the match is the greatest carried
    tuple — the same answer at any partitioning."""
    ldf = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:05:00"))], "user_id long, event_id long, ts timestamp"
    )
    rows = [
        (1, _ts("2024-01-01T10:00:00"), 100.0),
        (1, _ts("2024-01-01T10:00:00"), 200.0),
    ]
    for npart in (1, 2, 7):
        rdf = spark.createDataFrame(rows, "user_id long, ts timestamp, price double").repartition(npart)
        got = windows.asof_join(ldf, rdf, on=["user_id"]).first().price
        assert got == 200.0  # greatest (ts, price) tuple, every time


def test_asof_join_carries_unorderable_map_columns(spark):
    """A map-typed carried column must not break the join (maps cannot be
    sort keys, so the determinism tiebreak orders only the orderable
    fields) — the matched map still comes through atomically."""
    ldf = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:30:00"))], "user_id long, event_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 100.0, {"k": "v"})],
        "user_id long, ts timestamp, price double, props map<string,string>",
    )
    row = windows.asof_join(ldf, rdf, on=["user_id"]).first()
    assert row.price == 100.0 and dict(row.props) == {"k": "v"}


def test_asof_join_single_shuffle_no_range_explosion(spark):
    """The union-tag formulation plans exactly one Exchange on the key and
    never a range/nested-loop join."""
    ldf = spark.range(1000).select(
        (F.col("id") % 7).alias("user_id"), F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
    )
    rdf = spark.range(100).select(
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 11).alias("ts"),
        (F.col("id") * 1.5).alias("price"),
    )
    out = windows.asof_join(ldf, rdf, on=["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_asof_join_rejects_colliding_names(spark):
    """Silent-overwrite guards: suffixed outputs clobbering a distinct left
    column, two right columns suffixing to one name, and reserved internal
    column names must all raise instead of corrupting the result."""
    import pytest
    from shovel_spark.operators.windows import asof_join
    from datetime import datetime as dt

    t = dt(2024, 1, 1)
    left = spark.createDataFrame([(1, t, "keep")], "k long, ts timestamp, v_asof string")
    right = spark.createDataFrame([(1, t, 9.0)], "k long, ts timestamp, v double")
    left2 = left.withColumnRenamed("v_asof", "v")
    with pytest.raises(ValueError, match="collides with an existing left column"):
        asof_join(left.withColumn("v", F.lit(1.0)), right, on=["k"])
    with pytest.raises(ValueError, match="both map to"):
        asof_join(left2, right.withColumn("v_asof", F.lit(0.0)), on=["k"])
    with pytest.raises(ValueError, match="internal names"):
        asof_join(left2.withColumn("__ts", F.lit(0)), right, on=["k"])


def test_funnel_times_greedy_order(spark):
    """Ordered-funnel semantics: a step occurring BEFORE the previous
    stage's time doesn't count; unreached stages are NULL; every key
    appears exactly once."""
    from datetime import datetime as dt

    from shovel_spark.operators.windows import funnel_times

    rows = [
        (1, "view", dt(2024, 1, 1, 0)), (1, "click", dt(2024, 1, 1, 1)),
        (1, "purchase", dt(2024, 1, 1, 2)),
        (2, "click", dt(2024, 1, 1, 0)), (2, "view", dt(2024, 1, 1, 1)),  # click too early
        (3, "purchase", dt(2024, 1, 1, 0)),                               # never viewed
        (4, "view", dt(2024, 1, 1, 0)), (4, "click", dt(2024, 1, 1, 0)),  # same ts: strict >
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_purchase)
        for r in funnel_times(df, ["view", "click", "purchase"], ["user_id"]).collect()
    }
    assert len(got) == 4
    assert got[1] == (dt(2024, 1, 1, 0), dt(2024, 1, 1, 1), dt(2024, 1, 1, 2))
    assert got[2][0] == dt(2024, 1, 1, 1) and got[2][1] is None
    assert got[3] == (None, None, None)
    assert got[4][1] is None  # simultaneous click doesn't satisfy strict order
    # duplicate step names get positional suffixes
    f2 = funnel_times(df, ["view", "click", "view"], ["user_id"])
    assert "t_view" in f2.columns and "t_view_1" in f2.columns


def test_distributed_ntile_matches_global_ntile(spark):
    """Exact ntile parity against Spark's own global-window ntile for
    sizes below, at, and not divisible by the tile count — including the
    uneven-remainder split (first N%t tiles get the extra row)."""
    from pyspark.sql import Window

    for n in (7, 10, 23, 100, 101):
        df = spark.range(n).select(
            ((F.col("id") * 37) % 13).alias("v"), F.col("id").alias("uid")
        )
        want = {
            (r.v, r.uid): r.t
            for r in df.withColumn(
                "t", F.ntile(10).over(Window.orderBy("v", "uid"))
            ).collect()
        }
        got = {
            (r.v, r.uid): r.tile
            for r in windows.distributed_ntile(
                df, 10, ["v", "uid"], num_partitions=4
            ).collect()
        }
        assert got == want, f"n={n}"


def test_distributed_ntile_no_global_window(spark):
    """Every WindowExec in the ranking stage is PARTITIONED (by __pid) —
    the whole point: no single-partition global sort. Asserted on the
    pre-checkpoint plan (_range_ranked), where the window actually lives."""
    df = spark.range(1000).select(
        (F.col("id") % 97).alias("v"), F.col("id").alias("uid")
    )
    ranked = windows._range_ranked(df, ["v", "uid"], 8)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln and "windowspecdefinition" in ln]
    assert win_lines, plan  # the rank window must exist here
    for line in win_lines:
        assert "__pid" in line, f"unpartitioned window: {line}"
    # and the exchange is a RANGE partitioning, not a single partition
    assert "rangepartitioning" in plan.lower(), plan


def test_distributed_cumsum_matches_global_window(spark):
    """Exact parity with Spark's own global-window running total, inclusive
    and exclusive, including NULL values (add 0) and a value column that
    needs the long cast."""
    from pyspark.sql import Window

    df = spark.range(200).select(
        F.col("id").alias("uid"),
        F.when(F.col("id") % 17 == 0, None)
        .otherwise((F.col("id") * 31) % 97)
        .cast("int")
        .alias("v"),
    )
    v = F.coalesce(F.col("v").cast("long"), F.lit(0))
    for inclusive in (True, False):
        end = Window.currentRow if inclusive else -1
        w = Window.orderBy("uid").rowsBetween(Window.unboundedPreceding, end)
        want = {
            r.uid: r.c
            for r in df.withColumn(
                "c", F.coalesce(F.sum(v).over(w), F.lit(0))
            ).collect()
        }
        got = {
            r.uid: r.cumsum
            for r in windows.distributed_cumsum(
                df, "v", ["uid"], num_partitions=7, inclusive=inclusive
            ).collect()
        }
        assert got == want, f"inclusive={inclusive}"


def test_distributed_cumsum_no_global_window(spark):
    """The running-total window is partitioned by __pid and the exchange is
    a range partitioning — never a single-partition global sort; the
    partition offsets come back via a broadcast join, not a CASE chain."""
    df = spark.range(5000).select(
        F.col("id").alias("uid"), (F.col("id") % 11).alias("v")
    )
    out = windows.distributed_cumsum(df, "v", ["uid"], num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [
        ln
        for ln in plan.splitlines()
        if "Window" in ln and "windowspecdefinition" in ln
    ]
    assert win_lines, plan
    for line in win_lines:
        assert "__pid" in line, f"unpartitioned window: {line}"
    assert "BroadcastHashJoin" in plan, plan
    # no CASE chain: the offset expression must not scale with partitions
    assert plan.count("CASE WHEN") < 8, plan

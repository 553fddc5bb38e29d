from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.merge import upsert_latest


@pytest.fixture(scope="module")
def snapshots(spark):
    old = spark.createDataFrame(
        [("u1", 100, "a"), ("u2", 100, "b"), ("u3", 100, "c")],
        "url string, ts long, text string",
    )
    new = spark.createDataFrame(
        [("u2", 200, "B"), ("u4", 200, "d"), ("u5", None, "e")],
        "url string, ts long, text string",
    )
    return old, new


def test_latest_wins_and_new_keys_insert(spark, snapshots):
    old, new = snapshots
    got = {r["url"]: (r["ts"], r["text"]) for r in upsert_latest(old, new, "url", "ts").collect()}
    assert got == {
        "u1": (100, "a"),
        "u2": (200, "B"),
        "u3": (100, "c"),
        "u4": (200, "d"),
        "u5": (None, "e"),
    }


def test_rerun_same_snapshot_is_noop(spark, snapshots):
    old, new = snapshots
    once = upsert_latest(old, new, "url", "ts")
    twice = upsert_latest(once, new, "url", "ts")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_equal_ts_prefers_new(spark):
    old = spark.createDataFrame([("u", 100, "old")], "url string, ts long, text string")
    new = spark.createDataFrame([("u", 100, "new")], "url string, ts long, text string")
    assert upsert_latest(old, new, "url", "ts").first()["text"] == "new"


def test_null_ts_never_beats_dated(spark):
    old = spark.createDataFrame([("u", 100, "dated")], "url string, ts long, text string")
    new = spark.createDataFrame([("u", None, "undated")], "url string, ts long, text string")
    assert upsert_latest(old, new, "url", "ts").first()["text"] == "dated"


def test_tiebreak_makes_dup_key_snapshot_deterministic(spark):
    old = spark.createDataFrame([], "url string, ts long, text string")
    new = spark.createDataFrame(
        [("u", 100, "z"), ("u", 100, "a")], "url string, ts long, text string"
    )
    assert upsert_latest(old, new, "url", "ts", tiebreak="text").first()["text"] == "a"


def test_window_group_limit_in_plan(spark, snapshots):
    old, new = snapshots
    plan = (
        upsert_latest(old, new, "url", "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_snapshot_diff_classifies_all_cases(spark):
    from shovel_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("b", "2"), ("c", "9"), ("d", "4")], "url string, text string"
    )
    got = {r.url: r.status for r in snapshot_diff(old, new, "url", F.md5("text")).collect()}
    assert got == {"a": "removed", "b": "unchanged", "c": "changed", "d": "added"}
    # NULL fingerprints on both sides compare as unchanged (eqNullSafe)
    o2 = spark.createDataFrame([("x", None)], "url string, fp string")
    n2 = spark.createDataFrame([("x", None)], "url string, fp string")
    assert snapshot_diff(o2, n2, "url", "fp").first().status == "unchanged"

"""Bucketed co-located joins (no exchange) + salted skew joins (same rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators import joins


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark  # managed-table warehouse comes from the session config


def test_bucketed_join_elides_exchange(spark):
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    joins.write_bucketed(o, "b_orders", "o_orderkey", buckets=8, sort_by="o_orderkey")
    joins.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", buckets=8,
        sort_by="o_orderkey",
    )
    # small test tables would broadcast — disable it so the plan shows what
    # bucketing buys on two FACT-sized tables: a sort-merge join with no
    # exchange on either side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = joins.bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        tree = plan[: plan.index("(1) ")]
        assert "SortMergeJoin" in tree
        assert "Exchange" not in tree  # co-located: bucketing pre-shuffled both sides
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    # sanity: same result as plain join
    plain = (
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert j.count() == plain


def test_salted_join_equals_plain_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = (
        ev.select("user_id").distinct().withColumn("tier", F.pmod(F.col("user_id"), F.lit(3)))
    )
    plain = ev.join(users, "user_id").groupBy("tier").count()
    salted = joins.salted_join(ev, users, "user_id", salt=4).groupBy("tier").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_shuffle_key(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = ev.select("user_id").distinct()
    out = joins.salted_join(ev, users, "user_id", salt=4, how="inner")
    assert "__salt" not in out.columns
    assert out.count() == ev.count()

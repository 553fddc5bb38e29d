"""Custom Python Data Source: schema, partitioning, determinism, and
compatibility with the full pipeline chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.io.pages_source import register
from shovel_spark.pipeline import JobConfig, build_routed
from shovel_spark.synth import default_domain_rules, default_lang_map


@pytest.fixture(scope="module")
def pages_fmt(spark):
    register(spark)
    return spark


def _read(spark, n=500, seed=9, parts=4):
    return (
        spark.read.format("pages")
        .option("n", n)
        .option("seed", seed)
        .option("numPartitions", parts)
        .load()
    )


def test_schema_and_count(pages_fmt):
    df = _read(pages_fmt)
    assert df.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 4


def test_deterministic_across_reads(pages_fmt):
    a = _read(pages_fmt).orderBy("url").collect()
    b = _read(pages_fmt, parts=2).orderBy("url").collect()  # layout-independent
    assert a == b


def test_source_feeds_full_pipeline(pages_fmt, spark):
    df = _read(pages_fmt, n=800)
    routed = build_routed(df, default_lang_map(spark), default_domain_rules(spark), JobConfig())
    counts = {r["status"]: r["count"] for r in routed.groupBy("status").count().collect()}
    assert sum(counts.values()) == 800
    assert counts.get("acked", 0) > 0
    # every html body parses (this source plants no malformed rows)
    assert routed.filter(F.col("text").isNull()).count() == 0

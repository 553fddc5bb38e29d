"""Salted two-phase counts must equal naive groupBy exactly (FIXTURES.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.functions.parse import parse_pages
from shovel_spark.operators.aggregate import salted_count
from shovel_spark.synth import synth_pages


def test_salted_domain_counts_equal_naive(spark):
    df = parse_pages(synth_pages(spark, 4000, seed=5)).select("domain")
    naive = {r["domain"]: r["count"] for r in df.groupBy("domain").count().collect()}
    salted = {r["domain"]: r["n"] for r in salted_count(df, "domain").collect()}
    assert salted == naive


def test_skew_exists_in_synth(spark):
    """The generator must actually produce hot keys worth salting."""
    df = parse_pages(synth_pages(spark, 4000, seed=5))
    top = df.groupBy("domain").count().sort(F.desc("count")).first()
    assert top["count"] > 4000 * 0.15

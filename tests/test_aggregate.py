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


def test_cohort_retention_flags(spark):
    """Day-offset retention: exactly-N-days-later activity counts, nothing
    else; fractional seconds floor into the signup day; non-signup users
    are absent."""
    from datetime import datetime as dt

    from shovel_spark.operators.aggregate import cohort_retention

    rows = [
        (1, "signup", dt(2024, 1, 1, 23, 59, 59, 900000)),  # day 0 despite .9s
        (1, "view", dt(2024, 1, 2, 0, 0, 1)),               # day 1 -> retained_d1
        (1, "click", dt(2024, 1, 8, 12)),                   # day 7 -> retained_d7
        (2, "signup", dt(2024, 1, 1, 1)),
        (2, "view", dt(2024, 1, 3, 1)),                     # day 2: neither flag
        (3, "view", dt(2024, 1, 2, 5)),                     # never signed up
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = cohort_retention(df, days=[1, 7]).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r.cohort_day) == "2024-01-01"
    assert (r.n_users, r.retained_d1, r.retained_d7) == (2, 1, 1)

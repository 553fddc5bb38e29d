"""Drift detection: hand-computed PSI/JS terms, disjoint-support buckets,
and the identical-distribution zero case."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from shovel_spark.operators.drift import bucket_shares, drift_scores, drift_table


def _mk(spark, counts: dict[str, int]):
    rows = [(b,) for b, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "bucket string")


def test_bucket_shares_sum_to_one(spark):
    s = bucket_shares(_mk(spark, {"x": 3, "y": 1}), "bucket").collect()
    shares = {r.bucket: r.share for r in s}
    assert shares == {"x": 0.75, "y": 0.25}


def test_psi_hand_computed(spark):
    """a = 75/25, b = 50/50 over two buckets: psi = (0.75-0.5)ln(1.5)
    + (0.25-0.5)ln(0.5); js from the midpoint formula."""
    a, b = _mk(spark, {"x": 3, "y": 1}), _mk(spark, {"x": 2, "y": 2})
    row = drift_scores(drift_table(a, b, "bucket")).first()
    want_psi = 0.25 * math.log(1.5) + (-0.25) * math.log(0.5)
    m1, m2 = (0.75 + 0.5) / 2, (0.25 + 0.5) / 2
    want_js = (
        0.5 * 0.75 * math.log(0.75 / m1)
        + 0.5 * 0.5 * math.log(0.5 / m1)
        + 0.5 * 0.25 * math.log(0.25 / m2)
        + 0.5 * 0.5 * math.log(0.5 / m2)
    )
    assert abs(row.psi - want_psi) < 1e-12
    assert abs(row.js - want_js) < 1e-12
    assert row.n_buckets == 2


def test_disjoint_buckets_finite_and_ordered(spark):
    """A bucket present on only one side gets the eps floor — terms stay
    finite, and a fully disjoint pair scores (much) higher than an
    overlapping one. JS stays under its ln(2) bound."""
    a, b = _mk(spark, {"x": 4}), _mk(spark, {"y": 4})
    t = drift_table(a, b, "bucket").collect()
    assert {r.bucket for r in t} == {"x", "y"}
    for r in t:
        assert math.isfinite(r.psi_term) and math.isfinite(r.js_term)
    disjoint = drift_scores(drift_table(a, b, "bucket")).first()
    overlap = drift_scores(
        drift_table(_mk(spark, {"x": 3, "y": 1}), _mk(spark, {"x": 2, "y": 2}), "bucket")
    ).first()
    assert disjoint.psi > overlap.psi > 0
    assert 0 < disjoint.js <= math.log(2) + 1e-12


def test_identical_distributions_score_zero(spark):
    a = _mk(spark, {"x": 2, "y": 6})
    b = _mk(spark, {"x": 1, "y": 3})  # same shares, different sizes
    row = drift_scores(drift_table(a, b, "bucket")).first()
    assert abs(row.psi) < 1e-12 and abs(row.js) < 1e-12


def test_null_bucket_counts_as_bucket(spark):
    a = spark.createDataFrame([("x",), (None,)], "bucket string")
    b = spark.createDataFrame([("x",), ("x",)], "bucket string")
    t = {r.bucket: (r.n_a, r.n_b) for r in drift_table(a, b, "bucket").collect()}
    assert t[None] == (1, 0)
    assert t["x"] == (1, 2)


def test_null_bucket_on_both_sides_single_row(spark):
    """The null-safe join key folds a NULL bucket present on BOTH sides
    into one row instead of two half-rows."""
    a = spark.createDataFrame([("x",), (None,)], "bucket string")
    b = spark.createDataFrame([(None,), (None,)], "bucket string")
    t = drift_table(a, b, "bucket").collect()
    assert len(t) == 2
    nulls = [r for r in t if r.bucket is None]
    assert len(nulls) == 1 and (nulls[0].n_a, nulls[0].n_b) == (1, 2)

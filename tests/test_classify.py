"""operators/classify — hashed-BoW features + distributed logistic regression."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from shovel_spark.operators.classify import hashed_features, logreg_fit, logreg_predict


def _corpus(spark, n=120):
    rows = []
    for i in range(n):
        words = f"alpha{i % 7} beta{i % 5} gamma{i % 3}"
        if i % 2 == 1:
            words += " posmarker posmarker"
        rows.append((i, words, float(i % 2)))
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_logreg_learns_planted_marker(spark):
    d = _corpus(spark)
    feats = hashed_features(d, dim=32)
    w = logreg_fit(feats, d.select("doc_id", "y"), dim=32, iters=5, lr=2.0)
    pred = logreg_predict(feats, w)
    acc = (
        pred.join(d, "doc_id")
        .select(((F.col("p") >= 0.5) == (F.col("y") == 1.0)).cast("int").alias("ok"))
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95  # the marker makes the classes separable
    # the marker's bucket carries the largest positive weight
    mk = feats.sparkSession.createDataFrame([("posmarker",)], "t string").select(
        F.pmod(F.xxhash64("t"), F.lit(32)).alias("b")
    ).first()["b"]
    assert w[mk] == max(w[:32])


def test_logreg_deterministic_across_partitionings(spark):
    d = _corpus(spark, 60)
    feats = hashed_features(d, dim=16)
    w1 = logreg_fit(feats, d.select("doc_id", "y"), dim=16, iters=3)
    w2 = logreg_fit(feats.repartition(11), d.select("doc_id", "y"), dim=16, iters=3)
    assert w1 == w2


def test_predict_matches_manual_sigmoid(spark):
    d = spark.createDataFrame([(1, "aa aa bb")], "doc_id long, text string")
    feats = hashed_features(d, dim=8)
    rows = {r.bucket: r.x for r in feats.collect()}
    w = [0.1 * (i + 1) for i in range(8)] + [0.5]
    got = logreg_predict(feats, w).first()["p"]
    z = sum(w[b] * x for b, x in rows.items()) + 0.5
    assert abs(got - 1.0 / (1.0 + math.exp(-z))) < 1e-12


def test_hashed_features_normalized_and_sparse(spark):
    d = spark.createDataFrame(
        [(1, "aa aa bb"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = hashed_features(d, dim=8).collect()
    assert {r.doc_id for r in rows} == {1}  # empty/NULL excluded
    assert abs(sum(r.x for r in rows) - 1.0) < 1e-12  # counts/n sums to 1

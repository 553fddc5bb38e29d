"""DSIR importance resampling: hashed-ngram weights favor target-like docs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from shovel_spark.operators.dsir import (
    _distribution,
    dsir_log_weights,
    hashed_ngram_cells,
)


def _corpus(spark):
    rows = []
    for i in range(60):
        if i % 3 == 0:
            rows.append((i, "alpha beta alpha gamma alpha beta"))
        elif i % 3 == 1:
            rows.append((i, "delta epsilon zeta delta eta theta"))
        else:
            rows.append((i, "iota kappa lam mu nu xi omicron pi"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cells_count_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    cells = hashed_ngram_cells(df, buckets=8)
    # 3 unigrams + 2 bigrams = 5 features with multiplicity
    assert cells.agg(F.sum("cnt")).first()[0] == 5
    assert cells.agg(F.max("bucket")).first()[0] < 8
    assert cells.agg(F.min("bucket")).first()[0] >= 0


def test_distribution_is_normalized(spark):
    df = _corpus(spark)
    cells = hashed_ngram_cells(df, buckets=16)
    lam = _distribution(cells, 16, "s").collect()
    assert len(lam) == 16  # every bucket present, absent ones smoothed
    total = sum(math.exp(r["__ln_s"]) for r in lam)
    assert abs(total - 1.0) < 1e-9


def test_log_weights_favor_target_like_docs(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") % 3 == 0)  # the "alpha beta" docs
    w = {r.doc_id: r.logw for r in dsir_log_weights(df, target).collect()}
    alpha_docs = [w[i] for i in range(60) if i % 3 == 0]
    other_docs = [w[i] for i in range(60) if i % 3 != 0]
    assert min(alpha_docs) > max(other_docs)
    # and every document got scored with its full feature mass
    nf = {r.doc_id: r.n_feats for r in dsir_log_weights(df, target).collect()}
    assert nf[0] == 6 + 5  # 6 unigrams + 5 bigrams


def test_log_weights_deterministic_across_partitioning(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") % 3 == 0)
    a = {
        (r.doc_id, r.n_feats, round(r.logw, 9))
        for r in dsir_log_weights(df, target).collect()
    }
    b = {
        (r.doc_id, r.n_feats, round(r.logw, 9))
        for r in dsir_log_weights(df.repartition(7), target.coalesce(1)).collect()
    }
    assert a == b


def test_ratio_table_is_broadcast(spark):
    df = _corpus(spark)
    target = df.filter(F.col("doc_id") % 3 == 0)
    plan = (
        dsir_log_weights(df, target)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan

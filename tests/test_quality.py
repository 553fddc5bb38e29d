from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.quality import ngram_commonness


def test_unique_bigrams_score_one(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out == {1: 1.0, 2: 1.0}


def test_repeated_bigrams_score_higher(spark):
    rows = [(i, "the cat sat") for i in range(5)] + [(99, "weird zxq glyph")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out[0] == 5.0  # both bigrams occur 5x corpus-wide
    assert out[99] == 1.0
    assert all(out[i] == 5.0 for i in range(5))


def test_single_token_doc_clamps(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "solo")], "doc_id long, text string")
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out == {1: 2.0, 2: 2.0}


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, "a b"), (2, None)], "doc_id long, text string")
    out = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    assert out[1] == 1.0 and out[2] is None


def test_partition_invariant(spark):
    rows = [(i, f"tok{i % 3} tok{(i + 1) % 3} tok{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df).collect()}
    b = {r["doc_id"]: r["commonness"] for r in ngram_commonness(df.repartition(7)).collect()}
    assert a == b


def test_no_window_over_gram_key(spark):
    """Scale guard: corpus frequency must come from a map-side-combined
    groupBy + equi-join, never ``count(*) OVER (PARTITION BY gram)`` — a
    window would sort every occurrence of a stop-gram into one task."""
    df = spark.createDataFrame([(1, "a b c"), (2, "a b")], "doc_id long, text string")
    plan = ngram_commonness(df)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan

"""Count-based n-gram language-model scoring — the CCNet-style perplexity
filter of an LLM data pipeline, from scratch on DataFrames.

Pipelines like CCNet/Gopher/FineWeb rank web documents by how "language-like"
they are under a cheap LM trained on a trusted (or simply large) corpus and
drop the tail. A count-based bigram model is the fully-deterministic,
SQL-replayable form of that: training is two groupBy counts, scoring is two
joins and an average — no gradient, no external artifacts, exact parity with
a DuckDB oracle.

Model: additive (add-alpha) smoothing,

    P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)

with V = distinct unigram vocabulary of the training corpus. Unseen bigrams
degrade smoothly; a fully-unseen history scores 1/V per step. A document's
score is the mean natural-log probability over its bigrams (and
``perplexity = exp(-avg_logprob)``).

Scale shape (100 TB corpus):
  - training is two map-side-combinable groupBys; the count tables are
    vocabulary-sized (bounded by distinct bigrams, not corpus size) and
    shrink further with ``min_count`` pruning;
  - scoring explodes each document into (id, w1, w2) rows and equi-joins
    the count tables — a standard shuffle join AQE handles (hot function
    words skew the FACT side, which splits fine; the count side has one
    row per key). Document text itself never joins anything;
  - the vocabulary size joins in as a broadcast 1-row aggregate, keeping
    the whole computation one lazy plan (no driver scalar round-trip).

Reference analogy: shovel scores/filters per-message with pipeline
predicates (reference: src/core/pipeline.js filter nodes); this is the
corpus-statistical version of that gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shovel_spark.functions.textstats import tokens


def _bigram_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per ADJACENT token pair, in order, with
    multiplicity (an LM sees every occurrence; contrast shingle_table's
    per-doc distinct sets). Token array materialized behind a projection
    boundary (lambda-CSE: an inlined split would re-tokenize per pair)."""
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    # filter BEFORE building the pair sequence: sequence(1, 0) would emit a
    # DESCENDING [1, 0] for single-token docs, not an empty array
    t = t.filter(F.size("__w") >= 2)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__w") - 1),
        lambda i: F.struct(
            F.element_at("__w", i).alias("w1"),
            F.element_at("__w", i + 1).alias("w2"),
        ),
    )
    return (
        t.select(F.col(id_col), F.explode(pairs).alias("__bg"))
        .select(F.col(id_col), F.col("__bg.w1"), F.col("__bg.w2"))
    )


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """(unigrams, bigrams) count tables from a training corpus.

    unigrams: (w1, c1) — occurrences as a bigram HISTORY (first position),
    which is what the conditional denominator needs; bigrams: (w1, w2, c12).
    ``min_count`` prunes rare bigrams (the count table at web scale is
    dominated by hapax pairs; pruning them changes scores only through the
    smoothing term they would barely exceed anyway). The unigram table is
    never pruned — the denominator must count every occurrence."""
    bg = _bigram_rows(df, text_col, id_col)
    unigrams = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    bigrams = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= min_count)
    return unigrams, bigrams


def score_bigram_logprob(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, avg_logprob, perplexity) per document with >= 1
    bigram. Deterministic in (docs, counts, alpha) — no sampling, no
    iteration — so a SQL oracle replays it exactly."""
    # V rides along as a broadcast 1-row aggregate: vocabulary = distinct
    # histories observed in training
    vs = unigrams.agg(F.count("*").alias("__V"))
    bg = _bigram_rows(docs, text_col, id_col)
    joined = (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, "w1", "left")
        .crossJoin(F.broadcast(vs))
    )
    p = (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha)) / (
        F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("__V")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg(F.log(p)).alias("avg_logprob"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logprob")))
    )

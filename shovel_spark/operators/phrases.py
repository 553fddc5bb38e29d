"""Collocation / phrase mining over the corpus (word2phrase criterion).

Mikolov et al. 2013 ("Distributed Representations of Words and Phrases",
the word2phrase tool): adjacent word pairs scoring

    score(a, b) = (count(ab) - delta) * N / (count(a) * count(b))

above a threshold are promoted to phrases ("new", "york" -> "new_york").
A data pipeline uses the mined list to build phrase-aware vocabularies
and to normalize multi-word entities before dedup/indexing. The
reference has no corpus-statistics surface at all (closest: per-doc
routing predicates, `/root/reference/src/core/node.js`); this extends
the LLM-pipeline tier alongside TF-IDF and BM25.

Spark shape: two corpus passes, both map-side-combined groupBys —
unigram counts (vocab-sized result) and adjacent-bigram counts
(bigram-vocab-sized). The score join is bigrams ⋈ unigrams twice on the
word key — vocab-sized relations, AQE-splittable, never corpus-sized.
N is a 1-row broadcast. Top-k is TakeOrderedAndProject. No window over
content keys, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shovel_spark.functions.textstats import adjacent_pairs, tokens


def _tok(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
        .select(F.filter(tokens(F.col(text_col)), lambda w: w != "").alias("__t"))
    )


def phrase_scores(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    delta: float = 5.0,
    round_score: int | None = 6,
) -> DataFrame:
    """(word_a, word_b, pair_count, score) for every adjacent bigram with
    ``pair_count >= min_count``, scored by the word2phrase criterion
    (``delta`` discounts rare accidental co-occurrences). ``N`` is the
    corpus token count. ``round_score`` quantizes so two engines rank
    identically; None keeps full precision.
    """
    toks = _tok(df, text_col)
    uni = (
        toks.select(F.explode("__t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_row = uni.agg(F.sum("c").alias("__n"))
    bi = (
        toks.select(F.explode(adjacent_pairs(F.col("__t"))).alias("__p"))
        .select(F.col("__p.l").alias("word_a"), F.col("__p.r").alias("word_b"))
        .groupBy("word_a", "word_b")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    scored = (
        bi.join(uni.withColumnRenamed("w", "word_a").withColumnRenamed("c", "__ca"), "word_a")
        .join(uni.withColumnRenamed("w", "word_b").withColumnRenamed("c", "__cb"), "word_b")
        .join(F.broadcast(n_row))
    )
    # __ca cast to double BEFORE the product: long*long overflows (ANSI
    # throws) once two frequent words each pass ~3e9 occurrences; the
    # double product is exact for counts < 2^53 and feeds a float anyway
    score = (
        (F.col("pair_count") - F.lit(delta))
        * F.col("__n")
        / (F.col("__ca").cast("double") * F.col("__cb"))
    )
    if round_score is not None:
        score = F.round(score, round_score)
    return scored.select("word_a", "word_b", "pair_count", score.alias("score"))


def top_phrases(
    df: DataFrame,
    top_k: int = 20,
    min_count: int = 5,
    delta: float = 5.0,
    text_col: str = "text",
) -> DataFrame:
    """The ``top_k`` phrase candidates by (score desc, word_a, word_b) —
    a global TakeOrdered, never a full sort."""
    return (
        phrase_scores(df, text_col=text_col, min_count=min_count, delta=delta)
        .orderBy(F.desc("score"), "word_a", "word_b")
        .limit(top_k)
    )

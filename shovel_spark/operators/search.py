"""Keyword search over the corpus: inverted-index postings + BM25 ranking.

The reference dispatches documents through routing predicates
(`/root/reference/src/core/node.js`, pipeline fan-out) but has no ranked
retrieval; a training-data pipeline needs one — "find the documents most
about X" drives targeted curation, eval-set mining, and contamination
triage. This module gives the corpus a classic IR surface, Spark-first:

- :func:`build_postings` — the inverted index as a DataFrame
  (term, doc_id, tf, dl): one explode + map-side-combined groupBy, ready
  to persist partitioned/bucketed by term so later probes prune.
- :func:`bm25_topk` — Okapi BM25 (Robertson & Zaragoza 2009; the Lucene
  idf variant) top-k for a bag-of-terms query. The query-term filter is
  applied BEFORE the postings shuffle, so at corpus scale the shuffle
  carries only rows for the handful of queried terms, never the full
  vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shovel_spark.functions.textstats import tokens


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Inverted-index postings: one row per (term, doc) with the term
    frequency and the doc's token length — the relation every keyword
    scorer joins against.

    Scale shape: tokenize + explode + ONE map-side-combined groupBy on
    (term, doc); `dl` rides the grouping key (constant per doc) so no
    second join is needed. Persist with ``.write.partitionBy`` or
    bucketing on ``term`` and later probes prune to the queried terms.
    NULL/empty texts and NULL ids yield no postings.
    """
    base = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__w"))
        .withColumn("dl", F.size("__w"))
    )
    return (
        base.select("doc_id", "dl", F.explode("__w").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_score: int | None = 6,
) -> DataFrame:
    """Okapi BM25 top-``top_k`` documents for a bag-of-terms query::

        idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))     (Lucene form,
                                                               never negative)
        score(d)   = sum_t idf(t) * tf * (k1+1)
                     / (tf + k1 * (1 - b + b * dl / avgdl))

    Returns (doc_id, n_terms, score) — ``n_terms`` = how many distinct
    query terms matched — ordered by (score desc, doc_id asc).

    Scale shape: corpus stats (N, avgdl) are ONE row from a map-side
    length aggregate — no explode, no shuffle of content. The postings
    explode is filtered to the query terms BEFORE its groupBy, so the
    only corpus-sized shuffle carries len(query_terms) × matching-docs
    rows, not the vocabulary. Per-term df comes from those same filtered
    postings. The final top-k is a global ``orderBy().limit()`` —
    TakeOrderedAndProject, a per-partition heap + driver merge of
    ``top_k`` rows, never a full sort. ``round_score`` quantizes before
    the ranking so two engines elect identical docs (None = full
    precision).
    """
    terms = sorted(set(query_terms))
    base = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__w"))
        .withColumn("__dl", F.size("__w"))
        # postings filter + corpus stats both consume the tokenize: run it once
        .localCheckpoint(eager=False)
    )
    # avgdl as exact-int sum / exact-int count: ONE float division that
    # both engines compute identically (F.avg's streaming mean is
    # accumulation-order-dependent)
    stats = base.agg(
        F.count("*").alias("__n"),
        (F.sum("__dl") / F.count("*")).alias("__avgdl"),
    )
    postings = (
        base.select("doc_id", "__dl", F.explode("__w").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("term", "doc_id", "__dl")
        .agg(F.count("*").alias("__tf"))
    )
    docfreq = postings.groupBy("term").agg(F.count("*").alias("__df"))
    joined = postings.join(F.broadcast(docfreq), "term").join(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    tf_part = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf")
        + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    total = F.sum(idf * tf_part)
    if round_score is not None:
        total = F.round(total, round_score)
    scored = joined.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"), total.alias("score")
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(top_k)

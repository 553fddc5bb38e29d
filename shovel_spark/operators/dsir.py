"""DSIR-style data selection: hashed n-gram importance resampling.

Public technique (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): score every raw-corpus document by how much more
likely its hashed bag-of-n-grams is under a TARGET distribution (a trusted
corpus — Wikipedia, curated text) than under the RAW source distribution,
then resample the raw corpus by those importance weights. The result is a
web-scale corpus reshaped toward the target domain without training a
classifier.

From-scratch deterministic formulation (SQL-replayable, md5 feature hash):

  - features: unigrams AND adjacent bigrams of the whitespace token
    stream, hashed into ``buckets`` cells (``u:<w>`` / ``b:<w1> <w2>``
    namespacing keeps the two n-gram orders from colliding by accident);
  - both corpora fit a multinomial over the cells with add-one smoothing:
    ``lam[b] = (count[b] + 1) / (total + buckets)``;
  - a document's importance log-weight is
    ``sum_b cnt_b(x) * (ln lam_target[b] - ln lam_source[b])``;
  - selection: deterministic top-k by log-weight (the oracle-checked
    form), or FULL DSIR resampling by composing with
    ``sampling.weighted_sample_k`` using ``weight = exp(logw / temp)`` —
    Gumbel-top-k on importance weights, the paper's sampled variant.

Scale shape (100 TB source corpus):
  - the two distribution tables are ``buckets`` rows each — broadcast;
  - per-document cell counts explode tokens then groupBy (id, bucket):
    map-side combinable, bounded by ``buckets`` rows per document;
  - scoring is ONE broadcast join + one groupBy(id) — document text never
    enters a shuffle wider than its own hashed-cell counts;
  - no driver state beyond the plan (the distribution tables stay
    DataFrames end-to-end).

Reference analogy: node-shovel routes/filters per-event with static
predicates (reference: src/core/pipeline.js); DSIR is the corpus-level
statistical version — the gate is learned from the data itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shovel_spark.functions.textstats import tokens


def _bucket(col, buckets: int, salt: str):
    """md5 → 15-hex-digit int → mod buckets: engine-neutral (DuckDB:
    ('0x' || substr(md5(...), 1, 15))::BIGINT % buckets), sign-safe."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 15), 16, 10).cast(
        "long"
    ) % F.lit(buckets)


def hashed_ngram_cells(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    salt: str = "dsir:",
) -> DataFrame:
    """(id, bucket, cnt): hashed unigram+bigram feature counts per document,
    with multiplicity. At most ``buckets`` rows per document survive the
    groupBy — the document's only footprint downstream."""
    t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    uni = t.select(F.col(id_col), F.explode("__w").alias("__f")).select(
        F.col(id_col), F.concat(F.lit("u:"), F.col("__f")).alias("__f")
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("__w") - 1),
        lambda i: F.concat_ws(" ", F.element_at("__w", i), F.element_at("__w", i + 1)),
    )
    bi = (
        t.filter(F.size("__w") >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("__f"))
        .select(F.col(id_col), F.concat(F.lit("b:"), F.col("__f")).alias("__f"))
    )
    return (
        uni.unionByName(bi)
        .select(F.col(id_col), _bucket(F.col("__f"), buckets, salt).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def _distribution(cells: DataFrame, buckets: int, prefix: str) -> DataFrame:
    """(bucket, ln lam) over ALL buckets (absent cells get the pure
    smoothing mass) — ``buckets`` rows, built without collecting anything:
    a range frame of bucket ids left-joined against the observed counts,
    the corpus total riding along as a broadcast 1-row aggregate."""
    spark = cells.sparkSession
    counts = cells.groupBy("bucket").agg(F.sum("cnt").alias("__c"))
    total = cells.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("__tot"))
    frame = spark.range(buckets).select(F.col("id").cast("long").alias("bucket"))
    return (
        frame.join(counts, "bucket", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)) + F.lit(1.0))
                / (F.col("__tot") + F.lit(float(buckets)))
            ).alias(f"__ln_{prefix}"),
        )
    )


def dsir_log_weights(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """(id, n_feats, logw) for every source document: ``logw`` is the
    log importance ratio ln p_target(x) - ln p_source(x) under the two
    add-one-smoothed hashed-ngram multinomials; ``n_feats`` the document's
    total feature count (unigrams + bigrams, with multiplicity).

    Fully deterministic in (source, target, buckets) — no sampling, no
    iteration — so a SQL oracle replays it exactly. For the paper's
    resampling step, feed ``exp(logw)`` (optionally tempered) to
    ``sampling.weighted_sample_k``."""
    src_cells = hashed_ngram_cells(source, text_col, id_col, buckets)
    tgt_cells = hashed_ngram_cells(target, text_col, id_col, buckets)
    lam_s = _distribution(src_cells, buckets, "s")
    lam_t = _distribution(tgt_cells, buckets, "t")
    ratio = F.broadcast(
        lam_t.join(lam_s, "bucket").select(
            "bucket", (F.col("__ln_t") - F.col("__ln_s")).alias("__lr")
        )
    )
    return (
        src_cells.join(ratio, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("__lr")).alias("logw"),
        )
    )

"""Corpus-statistical quality scoring — n-gram commonness.

Between the scan-speed heuristics (textstats.quality_score) and a real
LM-perplexity filter sits the self-supervised statistical tier: score each
document by how common its word bigrams are IN THIS CORPUS. Fluent prose
reuses the corpus's own frequent n-grams; gibberish and boilerplate-free
junk sit in the rare tail. No external model — the corpus is the model
(the same two-pass shape as IDF).

Scale shape: ONE corpus scan, one explode, one gram-key shuffle (the
corpus frequency is a whole-partition window count over the exploded
grams — not a separate counts build that would rescan and re-explode the
corpus for the probe side), then one id shuffle for the per-doc mean.
Grams are hashed to 8-byte longs before the shuffle (the gram STRING
never shuffles — at 100 TB the bigram universe is billions of short
strings; same md5/xxhash64 family knob as operators/sampling, so a DuckDB
oracle replays the exact grouping). Per-doc score is exact integer
arithmetic until one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shovel_spark.functions.textstats import bigrams, tokens
from shovel_spark.operators.sampling import _hash_long


def ngram_commonness(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 7,
    family: str = "xxhash64",
) -> DataFrame:
    """Add ``commonness`` = mean corpus-wide occurrence count of the doc's
    bigram occurrences (≥ 1.0; higher = more formulaic/fluent, 1.0 = every
    bigram unique in the corpus). Deterministic: depends only on the corpus
    multiset, never on partitioning. Clamps like :func:`textstats.bigrams`
    (a 1-token doc scores its single word).

    Rows with NULL ids or NULL text are passed through with NULL
    commonness (left join back onto ``df``); NULL ids contribute nothing
    to the corpus statistics. ``id_col`` must be unique per row — duplicate
    ids would pool their grams into one score fanned back onto every
    duplicate row.
    """
    grams = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__w"))
        .select("__id", F.explode(bigrams(F.col("__w"))).alias("__gram"))
        # NULL text yields [NULL] from the clamped bigram transform, and
        # concat_ws would hash that to the shared '{seed}:' key, coupling
        # every NULL-text doc — drop the NULL grams instead (those docs
        # then surface with NULL commonness via the left join)
        .filter(F.col("__gram").isNotNull())
        .select("__id", _hash_long(F.col("__gram"), seed, family).alias("__gk"))
    )
    counted = grams.withColumn(
        "__cnt", F.count("*").over(Window.partitionBy("__gk"))
    )
    per_doc = counted.groupBy("__id").agg(
        (F.sum("__cnt") / F.count("*")).alias("commonness")
    )
    return df.join(per_doc, df[id_col] == per_doc["__id"], "left").drop("__id")

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented capability from
SURVEY.md §2 (plus the training-data ops) for the driver's DuckDB
side-by-side correctness check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shovel_spark.demo_queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402

# The driver's DuckDB oracle checks the FIRST 50 entries of ``queries()`` in
# iteration order.  Rounds 1-3 attested 55 distinct queries; the 32 below
# (everything added in rounds 2-3: wire codecs, curation tier, capstones)
# never got a driver row, so they are promoted to the front of the window.
# New round-4 queries are registered into this priority prefix too.
# Long-green legacy queries (attested in all of r01-r03) fill the tail.
_DRIVER_PRIORITY: list[str] = [
    # round-4 additions (attested never — brand new)
    "emb_lsh_topk_batch",
    "emb_ivf_topk_batch",
    "docs_minhash_capped_pairs",
    "docs_incremental_neardup",
    "docs_repeated_spans",
    "docs_excise_spans",
    "docs_resolve_best_quality",
    "docs_logreg_weights",
    "docs_tfidf_terms",
    "emb_hard_negatives",
    "pages_snapshot_diff",
    "stream_neardup_two_batches",
    "funnel_view_click_purchase",
    "cohort_retention_d1_d7",
    "xml_roundtrip",
    # never driver-attested (r2/r3 additions)
    "docs_ngram_commonness",
    "docs_crawl_refresh",
    "docs_training_corpus",
    "docs_clean_corpus",
    "docs_canonical_urls",
    "pages_snapshot_upsert",
    "docs_lang_rebalance",
    "docs_quota_sample",
    "docs_pack_shards",
    "docs_pagerank_mass",
    "docs_hash_split",
    "docs_hash_sample",
    "docs_chunk_udtf",
    "docs_benchmark_contamination",
    "docs_dup_clusters",
    "docs_redact_pii",
    "docs_repetition_stats",
    "docs_subword_tokens",
    "events_zorder_stats",
    "events_resample_dense",
    "events_value_histogram",
    "parse_variant_props",
    "emb_kmeans_cells",
    "user_zscore_extremes_native",
    "proto_roundtrip",
    "proto_delimited_roundtrip",
    "msgpack_roundtrip",
    # attested in r01/r02 only, missed r03's window
    "value_median_udaf",
    "user_zscore_extremes",
    "pivot_event_values",
    "orders_above_avg",
    "grok_log_roundtrip",
]


def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse → enrich → route pipeline over pages derived from
    /root/testdata/sf0.001 documents; returns per-(sink, status) counts."""
    return SPARK_QUERIES["pipeline_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2); aliases match
    oracle_sql column names exactly.  Ordered so the driver's 50-query
    window covers the queries with the fewest prior attestations first."""
    return _ordered(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same aliases, same rounding)."""
    return _ordered(ORACLE_SQL)

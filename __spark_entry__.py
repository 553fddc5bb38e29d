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
# iteration order. Rotation policy (round 7, finishing the cadence round 6
# promised): (1) the 37 r04-attested queries that did not fit in the r6
# window go FIRST — after this window every registered query has a
# driver-green row no older than two rounds; (2) queries whose
# IMPLEMENTATION was optimized this round re-attest next (results must be
# identical — the optimization round's own gate); (3) the freshest
# r06-attested rows fill the remainder. The full set is ALSO swept by
# scripts/check_correctness.py in CI (scripts/run_checks.sh), so the
# driver window is a sampling optimization, not the only gate.
_DRIVER_PRIORITY: list[str] = [
    # r04-attested spillover from the round-6 window — first priority (37)
    "docs_logreg_weights",
    "docs_minhash_capped_pairs",
    "docs_ngram_commonness",
    "docs_pack_shards",
    "docs_pagerank_mass",
    "docs_quota_sample",
    "docs_redact_pii",
    "docs_repeated_spans",
    "docs_repetition_stats",
    "docs_resolve_best_quality",
    "docs_subword_tokens",
    "docs_tfidf_terms",
    "docs_training_corpus",
    "emb_hard_negatives",
    "emb_ivf_topk_batch",
    "emb_kmeans_cells",
    "emb_lsh_topk_batch",
    "events_resample_dense",
    "events_value_histogram",
    "events_zorder_stats",
    "funnel_view_click_purchase",
    "grok_log_roundtrip",
    "msgpack_roundtrip",
    "orders_above_avg",
    "pages_snapshot_diff",
    "pages_snapshot_upsert",
    "parse_json_props",
    "parse_variant_props",
    "pivot_event_values",
    "proto_delimited_roundtrip",
    "proto_roundtrip",
    "route_sink_counts",
    "route_status_counts",
    "user_zscore_extremes",
    "user_zscore_extremes_native",
    "value_median_udaf",
    "xml_roundtrip",
    # optimized this round (implementation only — oracles unchanged):
    # re-attest that results are identical under the new plans
    "emb_semantic_dedup",
    "emb_ivf_topk",
    "emb_lsh_near_dups",
    "emb_margin_mining",
    "docs_dedup_suite",
    "docs_clean_corpus",
    "docs_incremental_neardup",
    "docs_incremental_neardup_capped",
    "stream_neardup_two_batches",
    "pipeline_replay_recovery",
    "docs_bpe_merges",
    "docs_tokenize_pack",
    "docs_bpe_fertility",
    # (window full at 50; everything else re-attested r05/r06 and swept in CI)
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

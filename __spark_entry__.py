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
# iteration order. Rotation policy (round 5): (1) the round-4 driver-red
# query, now fixed (partitionOverwriteMode pinned per-write), re-attests
# first; (2) brand-new round-5 queries; (3) the 47 queries whose last
# attestation is r03 — every registered query re-attests on a ~2-round
# cadence. The full set is ALSO swept by scripts/check_correctness.py in
# CI (scripts/run_checks.sh), so the driver window is a sampling
# optimization, not the only gate.
_DRIVER_PRIORITY: list[str] = [
    # round-4 FAIL, fixed in round 5 — must re-attest
    "stream_neardup_two_batches",
    # new in round 5
    "docs_incremental_neardup_capped",
    "multimodal_image_dims",
    "docs_bigram_lm_scores",
    "emb_semantic_dedup",
    "events_heavy_hitters_cm",
    "events_hll_users",
    "events_bloom_signup_filter",
    "docs_weighted_sample",
    "docs_dedup_suite",
    "events_hll_users_by_type",
    "docs_excise_contamination",
    # last driver-attested r03 (stalest first window)
    "pipeline_metrics",
    "multimodal_image_features",
    "docs_minhash_near_dups",
    "docs_exact_dedup_keep",
    "docs_fingerprints",
    "docs_lang_guess",
    "docs_langid_confusion",
    "docs_minhash_bands",
    "docs_quality_score",
    "docs_quality_stats",
    "docs_simhash_near_dups",
    "docs_token_stats",
    "docs_top_similar_pairs",
    "docs_unique_per_lang",
    "emb_centroid_norms",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_lsh_near_dups",
    "emb_lsh_topk",
    "emb_lsh_topk_multi",
    "enrich_translate",
    "events_value_quantiles",
    "except_users",
    "hourly_event_counts",
    "latest_event_per_user",
    "moving_avg_peak",
    "q10_returned_items",
    "q14_promo_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_late_ship_priority",
    "q5_local_supplier_volume",
    "range_join_error_purchases",
    "region_revenue",
    "render_index_name",
    "rollup_priority_status",
    "salted_join_user_value",
    "salted_priority_counts",
    # semi_join_segments / sessionize_30m / topk_parts_by_revenue /
    # value_deciles / anti_join_nations / asof_prior_signup /
    # broadcast_sink_counts / cube_priority_status /
    # distinct_users_per_type rotate to round 6 (window full at 50)
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

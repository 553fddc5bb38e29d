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
# iteration order. Rotation policy (round 6): (1) the nine queries that
# rotated out of the r5 window (last driver attestation r03) go FIRST;
# (2) brand-new round-6 queries; (3) events_heavy_hitters_cm re-attests
# because its oracle changed this round (sketch-derived total,
# greatest(1, ...) threshold); (4) the stalest r04-attested queries fill
# the window (alphabetical; the 37 that don't fit are listed at the end
# for round 7). The full set is ALSO swept by scripts/check_correctness.py
# in CI (scripts/run_checks.sh), so the driver window is a sampling
# optimization, not the only gate.
_DRIVER_PRIORITY: list[str] = [
    # rotated out of the r5 window (last attested r03) — first priority
    "semi_join_segments",
    "sessionize_30m",
    "topk_parts_by_revenue",
    "value_deciles",  # also re-implemented this round (distributed ntile)
    "anti_join_nations",
    "asof_prior_signup",
    "broadcast_sink_counts",
    "cube_priority_status",
    "distinct_users_per_type",
    # new in round 6
    "pipeline_replay_recovery",
    "stream_windowed_metrics",
    "multimodal_phash_dups",
    "multimodal_audio_meta",
    "docs_paragraph_dedup",
    "docs_gopher_rules",
    "docs_pack_blocks",
    "docs_dsir_sample",
    "multimodal_audio_rms",
    "emb_margin_mining",
    "docs_bm25_search",
    "docs_bpe_merges",
    "docs_bpe_fertility",
    "docs_phrase_mining",
    "docs_nfc_normalize",
    "docs_tokenize_pack",
    "events_hll_sharded_union",
    "events_value_qhist",
    "events_type_drift",
    "docs_bloom_decontamination",
    "docs_remove_boilerplate",
    "stream_hll_two_batches",
    "docs_crawl_frontier",
    "events_value_drift_qhist",
    "docs_robots_filter",
    "events_compaction_plan",
    "docs_sitemap_frontier",
    "docs_corpus_datacard",
    # oracle changed in round 6 — must re-attest
    "events_heavy_hitters_cm",
    # last driver-attested r04 (alphabetical, first 12 of 49)
    "cohort_retention_d1_d7",
    "docs_benchmark_contamination",
    "docs_canonical_urls",
    "docs_chunk_udtf",
    "docs_clean_corpus",
    "docs_crawl_refresh",
    "docs_dup_clusters",
    "docs_excise_spans",
    "docs_hash_sample",
    "docs_hash_split",
    "docs_incremental_neardup",
    "docs_lang_rebalance",
    # r04-attested spill to round 7 (window full at 50):
    # docs_logreg_weights,
    # docs_minhash_capped_pairs, docs_ngram_commonness, docs_pack_shards,
    # docs_pagerank_mass, docs_quota_sample, docs_redact_pii, docs_repeated_spans,
    # docs_repetition_stats, docs_resolve_best_quality, docs_subword_tokens,
    # docs_tfidf_terms, docs_training_corpus,
    # emb_hard_negatives, emb_ivf_topk_batch, emb_kmeans_cells, emb_lsh_topk_batch,
    # events_resample_dense, events_value_histogram,
    # events_zorder_stats, funnel_view_click_purchase, grok_log_roundtrip,
    # msgpack_roundtrip, orders_above_avg, pages_snapshot_diff,
    # pages_snapshot_upsert, parse_json_props, parse_variant_props,
    # pivot_event_values, proto_delimited_roundtrip, proto_roundtrip,
    # route_sink_counts, route_status_counts, user_zscore_extremes,
    # user_zscore_extremes_native, value_median_udaf, xml_roundtrip
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

"""Distribution drift detection between two corpus snapshots.

A production ingest pipeline (the reference's long-running daemon keeps
per-node counters for exactly this kind of monitoring — reference:
src/core/aggregated_metrics.js:100-132) needs to answer "did today's crawl
shift?" without eyeballing dashboards: compare the bucketed distribution of
any feature (lang, domain, quality score, token count) between a baseline
snapshot and a candidate snapshot and score the shift.

Two standard scores over the same per-bucket share table:

- PSI (population stability index): sum((pa - pb) * ln(pa / pb)) — the
  model-monitoring staple; > 0.25 is the conventional "major shift" alarm.
- Jensen-Shannon divergence: 0.5*KL(a||m) + 0.5*KL(b||m), m the midpoint —
  bounded [0, ln 2], symmetric, defined even for disjoint supports.

Scale shape: each side is ONE map-side-combinable groupBy bounded by the
bucket cardinality (bucket the feature first — lang codes, score deciles,
log-bucket token counts — never raw high-cardinality keys); the join runs
over bucket-sized tables; totals ride along as window-free broadcast
scalars. Nothing here is data-sized after the first aggregation, so the
same code scores a 100 TB snapshot pair.

Determinism: shares are integer/integer divisions (IEEE-exact, identical
in any engine); ln() may differ in the last ulp across engines, so query
edges should round the score columns (the registered query rounds to 8
decimals; raw columns stay unrounded for library use).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_shares(df: DataFrame, bucket_col: str) -> DataFrame:
    """(bucket, n, share) for one snapshot: one bounded groupBy plus a
    broadcast total. NULL buckets count as their own bucket (drift INTO
    null-ness is drift worth seeing)."""
    counts = df.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "n",
            (F.col("n") / F.col("__total")).alias("share"),
        )
    )


def drift_table(
    a: DataFrame, b: DataFrame, bucket_col: str, eps: float = 1e-6
) -> DataFrame:
    """Per-bucket drift terms between snapshots ``a`` (baseline) and
    ``b`` (candidate): (bucket, n_a, n_b, share_a, share_b, psi_term,
    js_term). Buckets absent from one side get share 0 before the eps
    floor — the floor keeps ln() finite and penalizes appearing/vanishing
    buckets smoothly instead of blowing up.

    psi_term = (pa - pb) * ln(pa / pb)           (eps-floored shares)
    js_term  = 0.5*pa*ln(pa/m) + 0.5*pb*ln(pb/m), m = (pa+pb)/2
    """
    sa = bucket_shares(a, bucket_col).select(
        "bucket", F.col("n").alias("n_a"), F.col("share").alias("share_a")
    )
    sb = bucket_shares(b, bucket_col).select(
        "bucket", F.col("n").alias("n_b"), F.col("share").alias("share_b")
    )
    # null-safe join key: a NULL bucket on both sides must land in ONE
    # row, not two half-rows (plain equality never matches NULLs)
    joined = sa.join(
        sb, sa["bucket"].eqNullSafe(sb["bucket"]), "full_outer"
    ).select(
        F.coalesce(sa["bucket"], sb["bucket"]).alias("bucket"),
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
        F.coalesce("share_a", F.lit(0.0)).alias("share_a"),
        F.coalesce("share_b", F.lit(0.0)).alias("share_b"),
    )
    pa = F.greatest(F.col("share_a"), F.lit(eps))
    pb = F.greatest(F.col("share_b"), F.lit(eps))
    m = (pa + pb) / 2
    return joined.select(
        "bucket",
        "n_a",
        "n_b",
        "share_a",
        "share_b",
        ((pa - pb) * F.log(pa / pb)).alias("psi_term"),
        (0.5 * pa * F.log(pa / m) + 0.5 * pb * F.log(pb / m)).alias("js_term"),
    )


def drift_scores(table: DataFrame) -> DataFrame:
    """One row (psi, js, n_buckets) summing a drift_table — the alarm
    inputs. Sums run over the bucket-sized table only."""
    return table.agg(
        F.sum("psi_term").alias("psi"),
        F.sum("js_term").alias("js"),
        F.count("*").alias("n_buckets"),
    )

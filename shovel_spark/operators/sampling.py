"""Deterministic sampling / dataset splitting for training-data pipelines.

A 100 TB corpus needs REPRODUCIBLE train/val/test assignment: the split of
a document must depend only on its id (never on partitioning, row order, or
run count), so re-runs, resumes, and incremental ingests agree. That rules
out df.sample/randomSplit (partition-order-sensitive) in favor of hashing
the id into a fixed bucket space — map-only, fused into the scan.

Same hash-family knob as operators/dedup.py: xxhash64 (JVM-intrinsic) for
production, md5 for engine-neutral verification (a DuckDB oracle replays
the exact assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space granularity: fractions are exact to 1/10000
_BUCKETS = 10_000


def _hash_bucket(col: Column, seed: int, family: str) -> Column:
    s = F.concat_ws(":", F.lit(str(seed)), col.cast("string"))
    if family == "md5":
        h = F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    elif family == "xxhash64":
        h = F.abs(F.xxhash64(s))
    else:
        raise ValueError(f"unknown hash family: {family!r}")
    return F.pmod(h, F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 7,
    family: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by id-hash (resolution
    1/10000) — the reproducible downsample for corpus ablations: the same
    (id, seed, family) is always in or out, regardless of partitioning or
    cluster size, and samples at different fractions NEST (a row in the 5%
    sample is also in the 10% sample — same hash, higher cutoff), unlike
    df.sample whose membership reshuffles per run.

    NULL ids are EXCLUDED: a row without an identity has no deterministic
    sample membership (hashing would drop every NULL row into one shared
    bucket — a nominal 10% sample keeping 100% or 0% of them)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    cutoff = round(fraction * _BUCKETS)
    return df.filter(
        F.col(id_col).isNotNull()
        & (_hash_bucket(F.col(id_col), seed, family) < cutoff)
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: int = 7,
    family: str = "xxhash64",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label from ``fractions`` (must sum to 1.0,
    resolution 1/10000) by hashing ``id_col`` with ``seed`` — stable across
    runs, partitionings, and engines (md5 family).

    The same (id, seed, family, ORDERED fractions) always lands in the
    same split — bucket cutoffs accumulate in the mapping's insertion
    order (deterministic for Python dicts), so reordering the entries
    reassigns the boundary buckets. Keep the fractions mapping identical
    across runs and an incremental ingest extends each split consistently;
    a resumed job cannot leak a document across the train/eval boundary.

    NULL ids all hash to one shared bucket (concat_ws skips NULLs) and so
    land in one split together — deterministic, but filter them out (or
    assign ids) upstream if that block matters.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    bucket = _hash_bucket(F.col(id_col), seed, family)
    expr = None
    cum = 0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += round(frac * _BUCKETS)
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)

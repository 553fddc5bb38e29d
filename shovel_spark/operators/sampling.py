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

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket space granularity: fractions are exact to 1/10000
_BUCKETS = 10_000


def _quantize(fraction: float) -> int:
    """fraction → bucket cutoff, half-UP (floor(x+0.5)) — the one rounding
    rule every sampler here and every DuckDB oracle replays (Python round()
    is half-even and disagrees with SQL at half-bucket fractions)."""
    return int(math.floor(fraction * _BUCKETS + 0.5))


def _seed_str(col: Column, seed: int) -> Column:
    """The '{seed}:{id}' wire string every hash below (and every DuckDB
    oracle replaying it) is defined over — one definition only."""
    return F.concat_ws(":", F.lit(str(seed)), col.cast("string"))


def _hash_long(col: Column, seed: int, family: str) -> Column:
    """Full-width non-negative hash of (seed, id) — md5 (engine-neutral,
    DuckDB: ('0x' || substr(md5(...), 1, 15))::BIGINT) or xxhash64."""
    s = _seed_str(col, seed)
    if family == "md5":
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    if family == "xxhash64":
        return F.abs(F.xxhash64(s))
    raise ValueError(f"unknown hash family: {family!r}")


def _hash_bucket(col: Column, seed: int, family: str) -> Column:
    return F.pmod(_hash_long(col, seed, family), F.lit(_BUCKETS))


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
    cutoff = _quantize(fraction)
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
        cum += _quantize(frac)
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def _hash_order(col: Column, seed: int, family: str) -> Column:
    """Full-width deterministic sort key for quota/packing order (the bucket
    hash above is only mod-10000 — too coarse to order rows)."""
    if family == "md5":
        # the hex string itself: lexicographic order is engine-neutral
        return F.md5(_seed_str(col, seed))
    if family == "xxhash64":
        return F.xxhash64(_seed_str(col, seed))
    raise ValueError(f"unknown hash family: {family!r}")


def quota_sample(
    df: DataFrame,
    key_col: str,
    n_per_key: int,
    id_col: str = "doc_id",
    seed: int = 7,
    family: str = "xxhash64",
) -> DataFrame:
    """Keep at most ``n_per_key`` rows per key, chosen by id-hash order —
    the domain-balancing cap a web corpus needs (no single hot domain may
    dominate the training mix). Membership depends only on (key's row ids,
    seed, family): stable across runs, partitionings, and engines (md5),
    and monotone in ``n_per_key`` (the 5-per-key sample contains the
    3-per-key sample — same ordering, longer prefix), unlike df.sample.

    Scale shape: a rank-limit window — Spark rewrites ``row_number() <= k``
    into WindowGroupLimit, a per-partition top-k BEFORE the shuffle, so a
    hot domain ships at most k·partitions rows, never its full row set.
    NULL ids are excluded (no identity → no deterministic membership).

    ``id_col`` must be UNIQUE per row (like :func:`ngram_commonness`):
    duplicate ids tie the (hash, id) sort key, and row_number then picks an
    arbitrary physical row among the duplicates — which row's OTHER columns
    survive would vary across partitionings even though membership counts
    stay deterministic.
    """
    if n_per_key < 0:
        raise ValueError(f"n_per_key must be >= 0, got {n_per_key}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(_hash_order(F.col(id_col), seed, family).asc(), F.col(id_col).asc())
    )
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_key)
        .drop("__rn")
    )


def pack_shards(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    num_buckets: int = 16,
    seed: int = 7,
    family: str = "xxhash64",
) -> DataFrame:
    """Assign every row to a training shard of ~``budget`` tokens:
    concatenate-then-chunk within hash buckets. Row order inside a bucket is
    id-hash order; a row whose preceding cumulative token count is in
    [k·budget, (k+1)·budget) lands in budget-slot k, and slots are then
    dense-renumbered so ``shard_seq`` runs 0,1,2,… with no gaps even when a
    single oversized document (> budget tokens) consumes several slots.
    Each shard's token total is in (budget - max_doc, budget + max_doc);
    NULL token counts occupy a slot position but add 0 to the accounting.

    Adds ``shard_bucket`` (hash bucket), ``shard_seq`` (dense within-bucket
    shard index from 0), ``shard_id`` (global = bucket·10^12 + seq; seq
    bounded by 10^12 — 2·10^15 tokens per bucket at budget 2000 — before
    ids could collide, far past any sane num_buckets choice). Assignment
    depends only on (ids, tokens, seed, family, num_buckets) — never on
    partitioning — so re-runs and resumes produce identical shards.

    Scale shape: buckets come from the FULL-WIDTH id hash mod num_buckets
    (no intermediate coarse bucket space), so any num_buckets is uniform;
    the only windows are per-bucket (the dense renumber reuses the same
    partitioning — one sort, no extra shuffle). At 100 TB set num_buckets
    so each bucket is a few GB (e.g. 10^5 buckets), giving full-cluster
    parallelism with no global sort and no driver state. NULL ids are
    excluded.

    ``id_col`` must be UNIQUE per row: duplicate ids tie the in-bucket sort
    key, making the cumulative-token walk (and thus shard boundaries for
    every later row in the bucket) dependent on which duplicate sorts
    first — i.e. on physical partitioning.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be > 0, got {num_buckets}")
    idc = F.col(id_col)
    bucket = F.pmod(_hash_long(idc, seed, family), F.lit(num_buckets))
    order = [_hash_order(idc, seed, family).asc(), idc.asc()]
    w_cum = (
        Window.partitionBy("shard_bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(token_col)).over(w_cum), F.lit(0)).cast("long")
    slot = F.floor(cum_before / F.lit(budget)).cast("long")
    w_dense = Window.partitionBy("shard_bucket").orderBy(F.col("__slot"))
    return (
        df.filter(idc.isNotNull())
        .withColumn("shard_bucket", bucket.cast("long"))
        .withColumn("__slot", slot)
        .withColumn("shard_seq", (F.dense_rank().over(w_dense) - 1).cast("long"))
        .drop("__slot")
        .withColumn(
            "shard_id",
            F.col("shard_bucket") * F.lit(1_000_000_000_000) + F.col("shard_seq"),
        )
    )


def pack_blocks(
    df: DataFrame,
    token_col: str,
    block_len: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """GPT-style concat-then-chunk packing: documents are concatenated in
    ``id_col`` order into ONE global token stream and cut into fixed
    ``block_len``-token training blocks, documents SPANNING block
    boundaries — no padding, no discarded remainder. The complement of
    pack_shards (which keeps every document whole inside a ~budget-token
    shard); this is the packing autoregressive pretraining actually uses
    for its fixed-length context windows (reference has no analog — its
    pipeline is per-event; this is the training-data tier).

    Adds per document: ``tok_start`` (global offset of its first token),
    ``first_block``/``last_block`` (block ids it touches),
    ``offset_in_block`` (position of its first token inside first_block),
    ``n_blocks`` (blocks spanned). Zero/NULL-token docs span nothing:
    first = last = the block their offset falls in, n_blocks = 1.

    Scale shape: ONE distributed_cumsum (range exchange + per-partition
    windows + num_partitions-row driver state) and map-side arithmetic —
    no global window, no data-sized driver state, no shuffle of text.
    """
    from shovel_spark.operators.windows import distributed_cumsum

    if block_len <= 0:
        raise ValueError(f"block_len must be > 0, got {block_len}")
    out = distributed_cumsum(
        df.filter(F.col(id_col).isNotNull()),
        token_col,
        [id_col],
        num_partitions,
        out_col="tok_start",
        inclusive=False,
    )
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0).cast("long"))
    first = F.floor(F.col("tok_start") / F.lit(block_len)).cast("long")
    last = F.floor(
        (F.col("tok_start") + F.greatest(toks, F.lit(1)) - 1) / F.lit(block_len)
    ).cast("long")
    return (
        out.withColumn("first_block", first)
        .withColumn("last_block", last)
        .withColumn(
            "offset_in_block", F.pmod(F.col("tok_start"), F.lit(block_len)).cast("long")
        )
        .withColumn(
            "n_blocks", (F.col("last_block") - F.col("first_block") + 1).cast("long")
        )
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 7,
    family: str = "xxhash64",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic downsample: keep ``fractions[key]`` of each
    key's rows by id-hash (resolution 1/10000) — the data-MIXING stage of a
    training corpus (rebalance languages/domains to target weights). Same
    membership guarantees as :func:`hash_sample` (stable across runs,
    partitionings, engines; nested across fractions), applied per key;
    unlisted keys — and rows whose ``key_col`` is NULL (every equality
    branch is NULL for them) — keep ``default_fraction``. Map-only, fused
    into the scan.
    """
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    cutoff = None
    for k, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1], got {frac}")
        c = _quantize(frac)
        cond = F.col(key_col) == k
        cutoff = F.when(cond, c) if cutoff is None else cutoff.when(cond, c)
    dflt = _quantize(default_fraction)
    cutoff = F.lit(dflt) if cutoff is None else cutoff.otherwise(dflt)
    return df.filter(
        F.col(id_col).isNotNull()
        & (_hash_bucket(F.col(id_col), seed, family) < cutoff)
    )


def temperature_fractions(
    counts: dict[str, int], target_total: int, alpha: float = 0.5
) -> dict[str, float]:
    """UniMax-style α-temperature mixing fractions from per-key row counts:
    weight w_k = n_k^α (quantized to 1/1000 INTEGERS so the weight sum is
    exact and order-free), keep fraction f_k = min(1, target·w_k/Z/n_k).
    α<1 flattens the distribution (head keys downsampled, tail kept whole).

    Pure driver-side arithmetic over the k-row count summary (the same
    k-rows-to-the-driver budget as k-means centroids). For α=0.5 every op
    (sqrt, int·int, float divides, min) is correctly-rounded IEEE — a SQL
    oracle replaying the same expression gets bit-identical fractions; other
    α use pow, which may differ by 1 ulp across engines (fine in production,
    not oracle-grade).
    """
    if target_total < 0:
        raise ValueError(f"target_total must be >= 0, got {target_total}")
    if not counts:
        return {}
    w = {
        k: int(math.floor((math.sqrt(n) if alpha == 0.5 else float(n) ** alpha) * 1000 + 0.5))
        for k, n in counts.items()
    }
    z = sum(w.values())
    if z == 0:
        return {k: 0.0 for k in counts}
    return {
        k: 0.0 if counts[k] == 0 else min(1.0, target_total * w[k] / z / counts[k])
        for k in counts
    }


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
    family: str = "xxhash64",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement, k rows (per group
    with ``group_cols``): Efraimidis–Spirakis A-ES — draw a reproducible
    uniform u_i from hash(seed, id), rank by key_i = u_i^(1/w_i), keep the
    top k. Inclusion probability rises with weight exactly as sequential
    weighted reservoir sampling prescribes, but the computation is one
    map-only key expression + a top-k — order-free, partition-free,
    engine-replayable (the LLM-pipeline use: quality-weighted corpus
    draws where doubling a doc's quality score doubles its draw odds).

    Determinism details: u = (hash_52bits + 1) / (2^52 + 1) ∈ (0,1) — a
    dyadic rational both engines represent exactly; the ranking key is the
    LOG-DOMAIN form ln(u)/w (same ordering as the textbook u^(1/w), but it
    can't underflow to an equal-for-everyone 0 for small fractional
    weights — quality scores < 1 are the normal case), ROUNDED to 9
    decimals with the id as tie-break, so an oracle ordering by the same
    rounded key selects the identical set even if ln() differs in the
    last ulp. Rows with weight <= 0 / NULL weight / NULL id never
    qualify (NULL ids would all hash alike and break the samplers'
    partition-invariance contract, same rule as hash_sample).

    Scale: global top-k plans as per-partition TakeOrdered + driver merge
    (no shuffle of the corpus); grouped top-k is a WindowGroupLimit —
    rank <= k prunes before the sort materializes a full group.
    """
    u = (_hash_long(F.col(id_col), seed, family).bitwiseAND(F.lit((1 << 52) - 1)) + 1) / F.lit(
        float((1 << 52) + 1)
    )
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 9)  # ln(u) < 0: larger (less negative) wins
    ranked = df.filter(
        F.col(id_col).isNotNull() & w.isNotNull() & (w > 0)
    ).withColumn("__wkey", key)
    if group_cols:
        from pyspark.sql import Window

        win = Window.partitionBy(*group_cols).orderBy(
            F.desc("__wkey"), F.asc(id_col)
        )
        return (
            ranked.withColumn("__rn", F.row_number().over(win))
            .filter(F.col("__rn") <= k)
            .drop("__rn", "__wkey")
        )
    return (
        ranked.orderBy(F.desc("__wkey"), F.asc(id_col))
        .limit(k)
        .drop("__wkey")
    )

"""Count-min sketch + heavy hitters, from scratch on DataFrames.

The reference keeps per-node/per-sink counters in memory and merges them
across workers (reference: src/core/aggregated_metrics.js:100-132); exact
per-KEY counts at web scale (per-domain, per-user) are a different beast —
the key space is unbounded and a hot-key groupBy is the classic skew wound.
A count-min sketch bounds the state at ``depth * width`` cells no matter the
cardinality, overestimates only (never undercounts), and merges by cell-wise
addition — the mergeable-summary property that makes it the streaming/
cross-worker counter of choice.

Engine-neutral hashing: bucket = int(md5("cm{row}:" || key)[:8 hex]) % width
— the same arithmetic is expressible in any SQL engine, so an external
oracle can replay the ENTIRE sketch (cells, estimates, heavy-hitter
election) exactly; nothing here is "approximately tested".

Scale shape: building is one explode(depth) + map-side-combinable groupBy —
the shuffle carries at most depth*width partial cells per map task,
REGARDLESS of key skew (the hot key folds into its cell map-side: the
sketch is itself the skew defense). Estimation joins candidate keys against
the depth*width cell table (broadcastable at any realistic width).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df


def md5_mod(col: Column, modulus: int, salt: str = "", hex_chars: int = 8) -> Column:
    """THE engine-neutral hash-to-bucket idiom, defined once: first
    ``hex_chars`` hex chars of md5(salt || col) as an unsigned int, mod
    ``modulus`` — replayable in any SQL engine as
    ``('0x' || substr(md5(salt || x), 1, hex_chars))::BIGINT % modulus``.
    ``hex_chars`` <= 15 keeps the value sign-safe in a 64-bit BIGINT."""
    if not 1 <= hex_chars <= 15:
        raise ValueError("hex_chars must be in [1, 15] for BIGINT sign safety")
    h = F.md5(F.concat(F.lit(salt), col)) if salt else F.md5(col)
    return F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("long") % modulus


def cm_bucket(key: Column, row: int, width: int) -> Column:
    """Bucket of ``key`` in hash row ``row`` — md5-derived so any engine
    reproduces it: first 8 hex chars as an unsigned int, mod width."""
    return md5_mod(key, width, salt=f"cm{row}:").alias("bucket")


def count_min_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(row, bucket, c) — the sketch's non-zero cells (at most depth*width
    rows). One pass: each input row contributes ``depth`` (row, bucket)
    increments via a single explode; the groupBy pre-aggregates map-side,
    so a hot key never shuffles more than depth cells per task."""
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), cm_bucket(k, r, width))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("__c"))
        .groupBy(F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
        .agg(F.count("*").alias("c"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(key, est) for each candidate key: min over the key's depth cells —
    the count-min estimate, >= the true count always (collisions only add).
    The sketch side is depth*width rows — broadcast it. The build stores
    only NON-ZERO cells, so the join is left + coalesce(0): a key whose
    cells were never touched estimates 0, it doesn't vanish."""
    k = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("row"), cm_bucket(k, r, width))
                    for r in range(depth)
                ]
            )
        ).alias("__c"),
    ).select(key_col, F.col("__c.row").alias("row"), F.col("__c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_frac: float = 0.01,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(key, est, exact) for every key whose ESTIMATE reaches
    ``min_frac`` of the total row count — count-min's no-false-negative
    guarantee means every true heavy hitter surfaces (some near-threshold
    keys may ride in on collisions; the exact column, one extra groupBy
    over the already-shortlisted keys, settles them).

    Two passes, both skew-proof: build the sketch (bounded shuffle), then
    estimate over distinct keys and keep the shortlist. The exact
    recount touches only shortlisted keys (semi-join pushdown).

    The TOTAL comes from the sketch itself — every input row increments
    exactly one cell of hash row 0, so sum(row-0 cells) == count(*) —
    not from a separate ``df.count()`` job, which at 100 TB would be a
    second full scan. The sketch is localCheckpointed (depth*width rows)
    so the total read and the estimate broadcast share one build. The
    threshold floors at 1, which only pins down the semantics of the
    degenerate ``total*min_frac < 1`` call ("at least a fraction of a
    row" reads as "at least one row"). It is NOT a skew defense: at such
    tiny totals every present key has est >= 1 and the whole distinct-key
    set is shortlisted anyway — fine precisely because the input is tiny.
    The sketch's bounded state is what protects the LARGE-total case,
    where the threshold sits far above 1."""
    sketch = count_min_build(df, key_col, depth, width).localCheckpoint()
    total = sketch.filter(F.col("row") == 0).agg(F.sum("c").alias("__total"))
    threshold = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.col("__total") * F.lit(min_frac)).cast("long"),
    )
    cands = cm_estimate(sketch, df.select(key_col).distinct(), key_col, depth, width)
    hot = (
        cands.crossJoin(F.broadcast(total))
        .filter(F.col("est") >= threshold)
        .drop("__total")
    )
    exact = (
        df.join(F.broadcast(hot.select(key_col)), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("exact"))
    )
    return hot.join(exact, key_col).select(key_col, "est", "exact")


# --- HyperLogLog ------------------------------------------------------------

HLL_BITS = 60  # md5-derived hash width used below (15 hex chars, sign-safe)


def _hll_hash(key: Column) -> Column:
    """60-bit engine-neutral hash: 15 hex chars of md5 as an unsigned int
    (16 chars could overflow a signed BIGINT in SQL engines)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _hll_bucket_rho(key_col: str, b: int) -> tuple[Column, Column]:
    """(bucket, rho) expressions shared by the plain and grouped builds —
    ONE definition of the register bit-logic.

    bucket = low b bits of the hash; rho = position of the lowest set bit
    of the remaining 60-b bits, computed with INTEGER comparisons only —
    no float log2 — so any SQL engine reproduces the registers
    bit-for-bit. All-zero remainder (hash a multiple of 2^60) pins rho at
    its max, 60-b+1. The shift is integer (shiftright), NOT division:
    float division of a 60-bit value loses low bits past the 52-bit
    mantissa — exactly the bits rho reads. The nested WHENs are built
    high-bit-first so the innermost (last-applied) test — bit 0 — wins."""
    m = 1 << b
    h = _hll_hash(F.col(key_col).cast("string"))
    rest = F.shiftright(h, b)
    rho = F.lit(HLL_BITS - b + 1)
    for i in range(HLL_BITS - b - 1, -1, -1):
        rho = F.when((rest.bitwiseAND(F.lit(1 << i))) != 0, F.lit(i + 1)).otherwise(rho)
    return (h % m).alias("bucket"), rho.alias("__rho")


def hll_build(
    df: DataFrame, key_col: str, b: int = 6
) -> DataFrame:
    """(bucket, reg) HyperLogLog registers, m = 2^b rows max — one
    map-side-combinable groupBy: max per bucket. NULL keys are excluded
    (countDistinct ignores them too)."""
    bucket, rho = _hll_bucket_rho(key_col, b)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(bucket, rho)
        .groupBy("bucket")
        .agg(F.max("__rho").alias("reg"))
    )


def _hll_alpha(m: int) -> float:
    """Standard HLL bias constants: fixed for the small register counts,
    the asymptotic formula for m >= 128 — ONE definition for both the
    plain and grouped estimators."""
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))


def hll_estimate_expr(m: int) -> Column:
    """Raw HLL estimate from (bucket, reg) rows aggregated over a frame
    that includes EMPTY buckets as reg=0: alpha_m * m^2 / sum(2^-reg).
    Use via hll_cardinality()."""
    return F.lit(_hll_alpha(m)) * F.lit(float(m * m)) / F.sum(
        F.pow(F.lit(2.0), -F.col("reg"))
    )


def hll_cardinality(registers: DataFrame, b: int = 6, spark=None) -> DataFrame:
    """One row: (m, nonzero, est) — the raw estimate with HLL's small-range
    (linear-counting) correction. Empty buckets count as reg=0."""
    m = 1 << b
    spark = spark or registers.sparkSession
    full = (
        spark.range(m).select(F.col("id").alias("bucket"))
        .join(registers, "bucket", "left")
        .select("bucket", F.coalesce(F.col("reg"), F.lit(0)).alias("reg"))
    )
    agg = full.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("reg") > 0, 1).otherwise(0)).alias("nonzero"),
        hll_estimate_expr(m).alias("raw"),
    )
    # linear counting below the standard 2.5m threshold with empty buckets
    v = F.col("m") - F.col("nonzero")
    est = F.when(
        (F.col("raw") <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.col("m").cast("double") / v),
    ).otherwise(F.col("raw"))
    return agg.select("m", "nonzero", est.alias("est"))


# --- Cross-shard sketch merging ---------------------------------------------
#
# The production reason sketches exist at 100 TB: build per shard /
# per day / per partition-subtree WITHOUT coordination, then union the
# tiny sketch tables instead of rescanning data. All three sketches here
# merge losslessly: HLL registers by max (merge(build(A), build(B)) ==
# build(A ∪ B), HLL's defining property), count-min cells by sum (the
# sketch is linear), Bloom bit arrays by bitwise OR.


def _merge_sketch_tables(frames, key_cols: list[str], agg) -> DataFrame:
    """Shared variadic merge fold: union the per-shard sketch tables and
    re-aggregate per key. Every mergeable sketch here is this pattern,
    only the key columns and the aggregate differ."""
    frames = list(frames)
    if not frames:
        raise ValueError("sketch merge needs at least one input")
    cols = [*key_cols, agg.alias_name]
    out = frames[0].select(*cols)
    for f in frames[1:]:
        out = out.unionByName(f.select(*cols))
    return out.groupBy(*key_cols).agg(agg.expr.alias(agg.alias_name))


class _MergeAgg:
    def __init__(self, expr: Column, alias_name: str):
        self.expr, self.alias_name = expr, alias_name


def _guard_bucket_bound(df: DataFrame, col: str, bound: int, what: str) -> DataFrame:
    """Fail the merge job if any positional index exceeds the bound the
    stated parameters imply — catches a shard built with LARGER
    parameters (the common mismatch). A shard built with smaller
    parameters keeps all indices in range and is NOT detectable from the
    table alone; the parameter contract stays on the caller."""
    return df.withColumn(
        col,
        F.when(
            F.col(col) >= F.lit(bound),
            F.raise_error(
                F.concat(
                    F.lit(f"{what}: index "),
                    F.col(col).cast("string"),
                    F.lit(f" out of range for bound {bound} — shard built "
                          "with different parameters?"),
                )
            ).cast(df.schema[col].dataType),
        ).otherwise(F.col(col)),
    )


def hll_merge(*register_sets: DataFrame, b: int | None = None) -> DataFrame:
    """Union per-shard (bucket, reg) HLL register sets: max per bucket.
    The result is exactly the register set a single build over the
    concatenated shards would produce; feed to hll_cardinality as usual.
    Cost: shuffles at most shards * m rows — never data-sized.

    Register indices are POSITIONAL: every shard must be built with the
    same ``b``. Pass ``b`` to add a runtime guard that fails the job if
    any bucket lands outside [0, 2^b) — catches a larger-b shard; a
    smaller-b shard is indistinguishable from sparse data, so the
    parameter contract is ultimately the caller's."""
    if b is not None:
        register_sets = tuple(
            _guard_bucket_bound(r, "bucket", 1 << b, "hll_merge")
            for r in register_sets
        )
    return _merge_sketch_tables(
        register_sets, ["bucket"], _MergeAgg(F.max("reg"), "reg")
    )


def cm_merge(
    *cell_sets: DataFrame, depth: int | None = None, width: int | None = None
) -> DataFrame:
    """Union per-shard (row, bucket, c) count-min cell tables: sum per
    cell (count-min is linear). Cells are POSITIONAL — shards must share
    depth/width; pass them to add runtime out-of-range guards (catches
    larger-parameter shards, see hll_merge). At most shards * depth *
    width rows shuffle."""
    if depth is not None or width is not None:
        guarded = []
        for cs in cell_sets:
            if depth is not None:
                cs = _guard_bucket_bound(cs, "row", depth, "cm_merge")
            if width is not None:
                cs = _guard_bucket_bound(cs, "bucket", width, "cm_merge")
            guarded.append(cs)
        cell_sets = tuple(guarded)
    return _merge_sketch_tables(
        cell_sets, ["row", "bucket"], _MergeAgg(F.sum("c"), "c")
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two one-row Bloom filters (bloom_build's (__m_bits, __k,
    bits) shape, preserved so the merged row is a drop-in for
    bloom_filter): bitwise OR of the bit arrays. Raises if the filters
    were built with different (m_bits, k) — the bit positions would not
    be comparable. Both inputs are localCheckpointed first (one-row
    frames): the metadata .first() would otherwise run each full build
    job once, and the crossJoin would run both AGAIN on consumption —
    the same recompute trap bloom_filter guards against."""
    a, b = a.localCheckpoint(), b.localCheckpoint()
    pa = a.select("__m_bits", "__k").first()
    pb = b.select("__m_bits", "__k").first()
    if (pa["__m_bits"], pa["__k"]) != (pb["__m_bits"], pb["__k"]):
        raise ValueError(
            f"bloom_merge parameter mismatch: ({pa[0]}, {pa[1]}) vs "
            f"({pb[0]}, {pb[1]})"
        )
    return (
        a.select(F.col("bits").alias("__ba"), "__m_bits", "__k")
        .crossJoin(b.select(F.col("bits").alias("__bb")))
        .select(
            "__m_bits",
            "__k",
            F.zip_with("__ba", "__bb", lambda x, y: x.bitwiseOR(y)).alias("bits"),
        )
    )


# --- Mergeable log-bucket quantile histogram (HDR-style) --------------------
#
# The fourth mergeable summary: quantiles. Exact percentiles need a global
# sort; approx_percentile's internal sketch is not replayable by an external
# engine. This histogram is: values are quantized to integers (floor(v *
# scale)) and assigned to HDR-style log buckets — exact below 2^s, then
# 2^s sub-buckets per octave — so the bucket index is pure integer
# arithmetic both engines reproduce bit-for-bit. State is bounded at
# (52 - s) * 2^s buckets regardless of data size, shards merge by summing
# counts (the histogram is linear, like count-min), and any quantile is
# answered from the cumulative bucket counts with relative error <= 2^-s
# (plus the 1/scale quantization floor).


def _qhist_exponent(iv: Column) -> Column:
    """floor(log2(iv)) for positive iv via the binary-string length —
    ``length(bin(iv)) - 1``. Both Spark and DuckDB strip leading zeros
    from bin(), so this is engine-neutral integer bit-work, no float
    log anywhere."""
    return (F.length(F.bin(iv)) - 1).cast("long")


def qhist_bucket(value: Column, scale: int = 16, s: int = 5) -> Column:
    """HDR bucket index of a non-negative value. iv = floor(value*scale)
    clamped at 0 (IEEE double multiply + floor — deterministic across
    engines); buckets 0..2^s-1 hold iv exactly, above that each octave e
    splits into 2^s sub-buckets: idx = (e-s)*2^s + (iv >> (e-s)).
    The shift is floor(iv / 2^(e-s)) — exact for iv < 2^52, i.e. values
    up to 2^52/scale, far beyond any telemetry magnitude."""
    iv = F.greatest(
        F.floor(value * F.lit(float(scale))).cast("long"), F.lit(0).cast("long")
    )
    e = _qhist_exponent(iv)
    shifted = F.floor(
        iv / F.pow(F.lit(2.0), (e - F.lit(s)).cast("double"))
    ).cast("long")
    return F.when(iv < F.lit(1 << s), iv).otherwise(
        (e - F.lit(s)) * F.lit(1 << s) + shifted
    )


def qhist_lower(bucket: Column, scale: int = 16, s: int = 5) -> Column:
    """Lower bound (in VALUE units) of a bucket — the quantile estimate
    returned for any rank that lands in it. Inverts qhist_bucket: below
    2^s the bucket IS the integer; above, g = (bucket >> s) - 1 octave
    shifts were applied, so lo = (bucket - g*2^s) * 2^g. The product
    stays under 2^52 (g <= 52-s by construction), exact as a double."""
    g = (F.floor(bucket / F.lit(float(1 << s)))).cast("long") - F.lit(1)
    rem = bucket - g * F.lit(1 << s)
    lo = F.when(
        bucket < F.lit(1 << s), bucket.cast("double")
    ).otherwise(rem.cast("double") * F.pow(F.lit(2.0), g.cast("double")))
    return lo / F.lit(float(scale))


def qhist_build(
    df: DataFrame, value_col: str, scale: int = 16, s: int = 5
) -> DataFrame:
    """(bucket, c) histogram rows — one map-side-combinable groupBy;
    the shuffle carries at most (52-s)*2^s partial cells per task no
    matter how the values are distributed (the histogram is its own
    skew defense, same as count-min). NULLs are excluded."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(qhist_bucket(F.col(value_col), scale, s).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )


def qhist_merge(*hists: DataFrame) -> DataFrame:
    """Union per-shard (bucket, c) histograms: sum per bucket — the
    histogram is linear, so merge(build(A), build(B)) == build(A ∪ B)
    exactly. At most shards * n_buckets rows shuffle.

    Bucket indices are POSITIONAL in (scale, s): every shard must be
    built with the same parameters. Unlike hll/cm there is no usable
    range bound to guard (any index is valid under some magnitude), so
    the contract rests entirely on the caller."""
    return _merge_sketch_tables(hists, ["bucket"], _MergeAgg(F.sum("c"), "c"))


def qhist_quantiles(
    hist: DataFrame, qs: list[float], scale: int = 16, s: int = 5
) -> DataFrame:
    """(q, bucket, est) for each requested quantile: the smallest bucket
    whose cumulative count reaches ceil(q * total), with est = that
    bucket's lower value bound. The cumulative window runs over the
    HISTOGRAM — sketch-sized, bounded rows — so the single-partition
    WindowExec is over <= (52-s)*2^s rows, never data-sized."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    cum = hist.select(
        "bucket",
        F.sum("c").over(
            Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("c").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("total"),
    )
    qdf = local_rows_df(spark, [(float(q),) for q in qs], "q double")
    hit = (
        F.broadcast(qdf)
        .crossJoin(cum)
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("q")
        .agg(F.min("bucket").alias("bucket"))
    )
    return hit.select(
        "q", "bucket", qhist_lower(F.col("bucket"), scale, s).alias("est")
    )


# --- Bloom filter -----------------------------------------------------------


def _bloom_pos(key: Column, probe: int, m_bits: int) -> Column:
    return md5_mod(key, m_bits, salt=f"bf{probe}:")


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """ONE-row DataFrame holding the filter: (bits array<long>, m_bits, k)
    — 32 bits used per word (sign-safe shifts in every engine).

    The Bloom filter is the scale answer to "semi-join a 100 TB fact
    against a key set too large to broadcast as a hash table": m bits of
    state regardless of key count, no false NEGATIVES (a missed key is
    impossible), a tunable false-positive trickle the downstream exact
    join absorbs. Spark's runtime row-level filtering does this implicitly
    for some joins; this is the explicit, engine-neutral operator form —
    md5-positioned bits, so an external SQL engine rebuilds the exact same
    bit array and the whole filtered result replays value-for-value.

    Build shape: k explode + groupBy(word) bit_or — map-side combinable,
    output bounded at m_bits/32 rows, assembled into one array row (stays
    a lazy plan; broadcast at use site)."""
    kc = F.col(key_col).cast("string")
    positions = F.array(*[_bloom_pos(kc, i, m_bits) for i in range(k)])
    words = (
        keys.select(F.explode(positions).alias("pos"))
        .select((F.col("pos") / 32).cast("long").alias("word"),
                (F.col("pos") % 32).cast("int").alias("bit"))
        .groupBy("word")
        # pow(2,bit) is exact for bit <= 31 (word width) and, unlike
        # shiftleft, accepts a COLUMN bit count in this pyspark version
        .agg(F.bit_or(F.pow(F.lit(2.0), F.col("bit")).cast("long")).alias("w"))
    )
    n_words = (m_bits + 31) // 32
    spark = keys.sparkSession
    dense = (
        spark.range(n_words).select(F.col("id").alias("word"))
        .join(words, "word", "left")
        .select("word", F.coalesce(F.col("w"), F.lit(0)).alias("w"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "w"))), lambda s: s["w"]
        ).alias("bits")
    ).select(F.lit(m_bits).alias("__m_bits"), F.lit(k).alias("__k"), "bits")


def bloom_filter(
    df: DataFrame, bloom: DataFrame, key_col: str,
    m_bits: int | None = None, k: int | None = None,
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the built set (all k probe bits
    set) — the broadcast prefilter a shuffle semi-join then settles
    exactly. The one-row filter broadcasts; the fact side is map-only.

    ``m_bits``/``k`` default to the values STORED in the filter row (one
    tiny driver read) — probing with parameters that differ from the build
    would silently break the no-false-negative guarantee, which is the
    whole point; pass them explicitly only to skip the metadata read when
    you know they match."""
    if m_bits is None or k is None:
        # materialize once: the metadata read would otherwise run the
        # whole build job a second time when the crossJoin executes
        bloom = bloom.localCheckpoint()
        meta = bloom.select("__m_bits", "__k").first()
        m_bits = int(meta["__m_bits"]) if m_bits is None else m_bits
        k = int(meta["__k"]) if k is None else k
    kc = F.col(key_col).cast("string")
    pred = F.lit(True)
    for i in range(k):
        pos = _bloom_pos(kc, i, m_bits)
        word = (pos / 32).cast("long")
        bit = (pos % 32).cast("int")
        mask = F.pow(F.lit(2.0), bit).cast("long")
        hit = (
            F.element_at(F.col("bits"), (word + 1).cast("int")).bitwiseAND(mask) != 0
        )
        pred = pred & hit
    return df.crossJoin(F.broadcast(bloom)).filter(pred).drop("bits", "__m_bits", "__k")


def hll_build_grouped(
    df: DataFrame, group_col: str, key_col: str, b: int = 6
) -> DataFrame:
    """(group, bucket, reg) — one HLL register set PER GROUP (the
    per-domain / per-sink distinct-visitor counter shape): state is
    m = 2^b longs per group however many rows feed it, merge across
    workers/batches is max per (group, bucket). Bit-logic is the SAME
    _hll_bucket_rho expressions as hll_build; NULL keys are excluded
    (a NULL hash would otherwise emit a phantom NULL-bucket register
    with max rho and inflate the group's estimate)."""
    bucket, rho = _hll_bucket_rho(key_col, b)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(group_col), bucket, rho)
        .groupBy(group_col, "bucket")
        .agg(F.max("__rho").alias("reg"))
    )


def hll_cardinality_grouped(
    registers: DataFrame, group_col: str, b: int = 6
) -> DataFrame:
    """(group, nonzero, est) per group from grouped registers; empty
    buckets count as reg=0 via the nonzero count (sum over 2^-reg for
    absent buckets contributes 1 each — algebra below — so no dense
    bucket frame is needed per group)."""
    m = 1 << b
    agg = registers.groupBy(group_col).agg(
        F.count("*").alias("__nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("__s"),
    )
    # absent buckets have reg=0: each contributes 2^0 = 1 to the sum
    full_sum = F.col("__s") + (F.lit(m) - F.col("__nz"))
    raw = F.lit(_hll_alpha(m)) * F.lit(float(m * m)) / full_sum
    v = F.lit(m) - F.col("__nz")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        F.col(group_col), F.col("__nz").alias("nonzero"), est.alias("est")
    )

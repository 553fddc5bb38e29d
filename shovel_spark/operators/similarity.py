"""Similarity search over embedding columns — brute-force cosine top-k as the
exact baseline, random-hyperplane LSH and IVF as the scale paths.

All vector math is JVM-side (``zip_with`` / ``aggregate`` higher-order
functions over ``array<float>``) — no Python, no UDF. At 10^9+ vectors the
brute-force path is a broadcast-join map-only scan (fine for one query),
LSH/IVF cut the scanned fraction for query *batches*.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_to_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def fast_dot(a: Column, b: Column, dim: int) -> Column:
    """``dot`` with the ``dim``-term sum unrolled into plain codegen'd
    arithmetic for rows where both arrays have exactly ``dim`` elements;
    any other row falls back to the interpreted fold of :func:`dot`.

    Bit-identical to :func:`dot` by construction: the unrolled sum starts
    from the same 0.0 seed and accumulates left-to-right in the same
    order ((0.0 + x1*y1) + x2*y2 + ...), each element cast to double
    exactly as the fold's element cast; the size guard keeps the
    out-of-shape cases (length mismatch, null arrays) on the fold path,
    so its null semantics are preserved and ``element_at`` never sees an
    out-of-bounds index under ANSI mode.

    Why: higher-order functions (``aggregate``/``zip_with``) are
    interpreted per element — measured ~5 µs per 64-dim pair vs ~0.1 µs
    unrolled. On semantic dedup's in-cell pair stage (~0.5M candidate
    pairs at sf0.1) that is the difference between 6.2 s and sub-second.
    """
    s: Column = F.lit(0.0)
    for i in range(dim):
        # F.get (0-based) over element_at: no ANSI out-of-bounds error
        # branch in codegen (the guard keeps every access in bounds
        # anyway) — measured 2.8 s vs 3.2 s on the 0.5M-pair stage
        s = s + F.get(a, i).cast("double") * F.get(b, i).cast("double")
    return F.when((F.size(a) == dim) & (F.size(b) == dim), s).otherwise(dot(a, b))


def _probe_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector length of the first row (None for empty input / null vector)
    — one config-sized job that lets pair stages unroll :func:`fast_dot`.
    Mixed-length corpora stay correct either way (the size guard routes
    non-conforming rows to the fold)."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).limit(1).collect()
    if not row or row[0]["n"] is None or row[0]["n"] <= 0 or row[0]["n"] > 4096:
        return None
    return int(row[0]["n"])


def cosine_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine to a literal query vector.

    Map-only scan + TakeOrderedAndProject: each partition keeps its local
    top-k, the driver merges — no shuffle of the corpus.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        df.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


# --- random-hyperplane LSH ----------------------------------------------------

def _plane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a seed (no RNG state —
    reproducible across runs/executors, like everything else here)."""
    import hashlib

    out = []
    for j in range(dim):
        h = hashlib.md5(f"{seed}:{j}".encode()).digest()
        out.append(int.from_bytes(h[:4], "big", signed=True) / 2**31)
    return out


def py_signature(vec: list[float], planes: int = 12, dim: int = 64, seed: int = 7) -> int:
    """Driver-side twin of :func:`hyperplane_signature` for a single query
    vector — same planes, same left-to-right double accumulation, so the
    result is bit-identical to the Spark expression (both are IEEE-754
    doubles applied in the same order; parity is pytest-asserted over the
    whole test corpus). Lets a probe sign its query with ZERO Spark jobs —
    the JVM path would codegen-compile a fresh 6x64-literal expression per
    query (~1s each).

    Edge-case parity with Spark SQL semantics (not Python's):
    - a vector whose length != dim makes zip_with null-pad, so every dot
      is NULL and ``NULL >= 0`` leaves the bit UNSET -> signature 0;
    - a NaN component makes the dot NaN, and Spark's ordering places NaN
      ABOVE all numbers, so ``NaN >= 0`` SETS the bit (Python's is False).
    """
    import math

    if len(vec) != dim:
        return 0
    sig = 0
    for p in range(planes):
        plane = _plane(dim, seed * 1000 + p)
        acc = 0.0
        for x, y in zip(vec, plane):
            acc += float(x) * y
        if acc >= 0 or math.isnan(acc):
            sig |= 1 << p
    return sig


def hyperplane_signature(vec: Column, planes: int = 12, dim: int = 64, seed: int = 7) -> Column:
    """Sign pattern of the vector against ``planes`` fixed hyperplanes,
    packed into one long — the LSH bucket key. Vectors with high cosine
    similarity collide with high probability."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        plane = F.array(*[F.lit(x) for x in _plane(dim, seed * 1000 + p)])
        bit = F.when(dot(vec, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(bit)
    return sig


def lsh_topk(
    df: DataFrame, query_vec: list[float], k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
    planes: int = 8, dim: int = 64, seed: int = 7,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket, exact cosine
    inside it. Bucket size ≈ n/2^planes — the tunable recall/cost knob.
    (Production variant: multiple hash tables for recall; same plumbing.)"""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qsig = py_signature(query_vec, planes, dim, seed)
    sim = cosine(F.col(vec_col), q)
    return (
        df.withColumn("__sig", hyperplane_signature(F.col(vec_col), planes, dim, seed))
        .filter(F.col("__sig") == qsig)
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def build_lsh_index(
    df: DataFrame, path: str,
    planes: int = 8, dim: int = 64, seed: int = 7,
    vec_col: str = "embedding",
    partition_bits: int = 8, num_tables: int = 1,
) -> None:
    """Materialize the hyperplane-LSH index: corpus written partitioned by
    (hash table, signature prefix).

    The one-shot :func:`lsh_topk` recomputes every corpus signature per
    query — a full scan each time, which defeats LSH at 100 TB. This is
    the amortized path (mirror of :func:`build_ivf_index`): sign the corpus
    ONCE, write ``partitionBy(table, sig_prefix)``, and every probe after
    that prunes to one signature-prefix directory per table at the parquet
    scan (PartitionFilters) — per-query I/O is ~num_tables·n/2^partition_bits
    of the corpus, refined to the exact bucket by a row filter on the
    stored full ``sig``.

    ``num_tables`` is the classic LSH recall knob: each table signs with
    independent hyperplanes (seed+t), a true neighbor is found if it
    collides in ANY table — recall 1-(1-p^planes)^num_tables at per-plane
    agreement p, for num_tables× index storage and probe I/O. One table
    reproduces the original layout exactly (table=0).

    ``partition_bits`` bounds the directory count at
    num_tables·2^partition_bits regardless of ``planes`` (1024 dirs is
    fine, 2^20 is not): when ``planes > partition_bits`` the partition key
    is the signature's high bits and the remaining bits are filtered
    row-wise inside the pruned partition (min/max stats on ``sig`` narrow
    that too).
    """
    bits = min(planes, partition_bits)
    per_table = []
    for t in range(num_tables):
        sig = hyperplane_signature(F.col(vec_col), planes, dim, seed + t)
        per_table.append(
            df.withColumn("table", F.lit(t)).withColumn("sig", sig).withColumn(
                "sig_prefix",
                F.shiftright(F.col("sig"), planes - bits) if planes > bits else F.col("sig"),
            )
        )
    out = per_table[0]
    for t in per_table[1:]:
        out = out.unionByName(t)
    (
        out.repartition("table", "sig_prefix")
        .write.mode("overwrite")
        # full index rebuild: pin STATIC so stale sig_prefix partitions
        # can't linger under a globally-dynamic session
        .option("partitionOverwriteMode", "static")
        .partitionBy("table", "sig_prefix")
        .parquet(path)
    )


def lsh_topk_indexed(
    spark, index_path: str, query_vec: list[float], k: int = 10,
    planes: int = 8, dim: int = 64, seed: int = 7,
    vec_col: str = "embedding", id_col: str = "vec_id",
    partition_bits: int = 8, num_tables: int = 1,
) -> DataFrame:
    """Approximate top-k over a materialized LSH index (build_lsh_index):
    sign the query once per table DRIVER-SIDE (py_signature — bit-identical
    to the build side's expression, zero Spark jobs, never recomputed over
    the corpus), scan ONLY the matching (table, sig_prefix) partitions
    (PartitionFilters prune at the scan), refine to the exact bucket
    row-wise, dedupe ids colliding in several tables, exact cosine inside
    the union of buckets.

    Per-query cost: ~num_tables/2^partition_bits of the index I/O + a
    map-only top-k. No shuffle of the corpus, no re-signing — the 100 TB
    ANN probe path; ``num_tables`` must match the build."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qsigs = {
        f"s{t}": py_signature(query_vec, planes, dim, seed + t)
        for t in range(num_tables)
    }
    bits = min(planes, partition_bits)
    # one scan PER table, unioned — NOT one scan with an OR filter: each
    # scan's conjunct-only predicate splits cleanly into PartitionFilters
    # (table, sig_prefix) + a data filter (sig), whereas an OR mixing
    # partition and data columns defeats static partition pruning entirely
    # (Spark only prunes on predicates referencing partition columns alone)
    idx = None
    for t in range(num_tables):
        qsig = qsigs[f"s{t}"]
        prefix = qsig >> (planes - bits) if planes > bits else qsig
        scan = (
            spark.read.parquet(index_path)
            .filter(F.col("table") == t)
            .filter(F.col("sig_prefix") == prefix)
            .filter(F.col("sig") == qsig)
        )
        idx = scan if idx is None else idx.unionByName(scan)
    sim = cosine(F.col(vec_col), q)
    sel = idx.select(F.col(id_col), sim.alias("sim"))
    if num_tables > 1:
        # an id colliding in several tables appears once per table; the
        # dedupe shuffles only the union of probed buckets (tiny)
        sel = sel.dropDuplicates([id_col])
    return sel.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)


def lsh_topk_indexed_batch(
    spark, index_path: str, queries: DataFrame, k: int = 10,
    planes: int = 8, dim: int = 64, seed: int = 7,
    vec_col: str = "embedding", id_col: str = "vec_id",
    partition_bits: int = 8, num_tables: int = 1,
    query_id_col: str = "query_id", query_vec_col: str = "query_vec",
) -> DataFrame:
    """Serve a query *DataFrame* against a materialized LSH index in ONE
    job: (query_id, vec_id, sim) with the top-``k`` per query.

    The scalable form of :func:`lsh_topk_indexed` (which takes one vector,
    computes its signature driver-side, and runs a job per probe —
    per-message dispatch). Production ANN serves millions of queries: here
    every query is SIGNED AS A COLUMN EXPRESSION (same
    hyperplane_signature the build side used — no driver loop, no
    py_signature calls), the signed queries broadcast into an equi-join on
    (table, sig_prefix, sig) against ONE index scan, and the per-query
    top-k is a rank-limit window (WindowGroupLimit — partial top-k before
    the shuffle).

    Scale shape: index I/O is one scan of the touched partitions TOTAL
    (not per query); Spark's dynamic partition pruning can drop untouched
    (table, sig_prefix) directories from the broadcast side. The join
    output is |bucket collisions|, the only shuffle is the window on
    query_id, and each (query, candidate) row carries ids + sim, never
    both vectors. ``num_tables``/``planes``/``seed`` must match the build."""
    bits = min(planes, partition_bits)
    per_table = []
    for t in range(num_tables):
        sig = hyperplane_signature(F.col(query_vec_col), planes, dim, seed + t)
        per_table.append(
            queries.select(
                F.col(query_id_col), F.col(query_vec_col),
                F.lit(t).alias("table"), sig.alias("__qsig"),
            )
        )
    signed = per_table[0]
    for t in per_table[1:]:
        signed = signed.unionByName(t)
    signed = signed.withColumn(
        "sig_prefix",
        F.shiftright(F.col("__qsig"), planes - bits) if planes > bits else F.col("__qsig"),
    )
    idx = spark.read.parquet(index_path)
    cand = idx.join(
        F.broadcast(signed),
        (idx["table"] == signed["table"])
        & (idx["sig_prefix"] == signed["sig_prefix"])
        & (idx["sig"] == signed["__qsig"]),
    )
    sim = cosine(idx[vec_col], signed[query_vec_col])
    sel = cand.select(
        signed[query_id_col].alias(query_id_col),
        idx[id_col].alias(id_col),
        sim.alias("sim"),
    )
    if num_tables > 1:
        # ids colliding in several tables appear once per table
        sel = sel.dropDuplicates([query_id_col, id_col])
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sel.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# --- IVF (inverted file / coarse quantization) ---------------------------------

def ivf_assign(
    df: DataFrame, centroids: DataFrame,
    vec_col: str = "embedding", id_col: str = "vec_id",
    centroid_vec: str = "centroid", centroid_id: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast crossJoin +
    min-by): the build side of an IVF index. At scale, write the output
    partitioned by cell — queries then scan only nprobe cells."""
    joined = df.crossJoin(F.broadcast(centroids))
    d = cosine(F.col(vec_col), F.col(centroid_vec))
    w = F.struct(d.alias("sim"), F.col(centroid_id).alias("cell"))
    return (
        joined.groupBy(id_col)
        .agg(F.max(w).alias("best"))
        .select(id_col, F.col("best.cell").alias("cell"), F.col("best.sim").alias("centroid_sim"))
    )


def _centroid_argmax(cents: list[tuple[int, list[float]]], vec_col: str) -> Column:
    """Map-only nearest-centroid election against DRIVER-SIDE centroids:
    ``array_max`` over one ``struct(sim, cell)`` per centroid — the same
    lexicographic (max sim, ties -> max cell) comparator as
    :func:`ivf_assign`'s ``groupBy.max(struct)``, with NO crossJoin, NO
    groupBy shuffle and NO join back (guide §2.4: remove shuffles
    outright). Centroid lists are k-row driver state everywhere this is
    used (k-means iterations, semantic_dedup's final assignment), so
    inlining them as literals is free and turns assignment into a pure
    projection that fuses into the consumer's stage.

    NOTE: the per-centroid cosine stays on the interpreted fold
    deliberately — an A/B that unrolled it via fast_dot (k unrolled
    256-term expressions per row) blew up generated-code size, de-JIT'd
    the whole stage and measured 2-4x SLOWER across every consumer
    (fast_dot pays off only for a single dot per row, as in the pair
    stages).

    Returns the winning ``struct(sim, cell)`` column."""
    entries = [
        F.struct(
            cosine(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in c])
            ).alias("sim"),
            F.lit(int(cid)).cast("bigint").alias("cell"),
        )
        for cid, c in cents
    ]
    return F.array_max(F.array(*entries))


def _kmeans_centroid_rounds(
    df: DataFrame, k: int, iters: int,
    vec_col: str, id_col: str, round_decimals: int,
) -> list[tuple[int, list[float]]]:
    """The Lloyd's trajectory of :func:`kmeans_centroids`, returned as the
    driver-side centroid list (k rows/iter — bounded). Each iteration is
    ONE job: assignment is the map-only literal argmax (no crossJoin /
    groupBy(id) / join-back — the r6 shape paid 3 extra exchanges per
    iteration), means are the same two-level aggregate as before."""
    spark = df.sparkSession
    init = (
        df.orderBy(id_col)
        .limit(k)
        .select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("centroid"))
        .collect()
    )
    cents = [(i, list(r.centroid)) for i, r in enumerate(init)]
    for _ in range(iters):
        best = _centroid_argmax(cents, vec_col)
        means = (
            # two projections: a generator (posexplode) in the SAME select
            # as the array_max struct access makes Spark's ExtractGenerator
            # rewrite drop the struct's field names (col1/col2) — resolved
            # by splitting the argmax into its own projection first
            df.select(best["cell"].alias("cell"), _to_double(F.col(vec_col)).alias("__v"))
            .select("cell", F.posexplode("__v").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("v"), round_decimals).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        cents = [(int(r.cell), list(r.centroid)) for r in means]
    return cents


def centroids_from_labels(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label", dim: int = 64
) -> DataFrame:
    """Per-label mean vectors via posexplode + two-level aggregate — the
    distributed centroid computation (k-means E-step shape)."""
    ex = df.select(F.col(label_col).alias("cell"), F.posexplode(vec_col).alias("pos", "v"))
    c = ex.groupBy("cell", "pos").agg(F.avg(F.col("v").cast("double")).alias("m"))
    return c.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def kmeans_centroids(
    df: DataFrame, k: int = 4, iters: int = 3,
    vec_col: str = "embedding", id_col: str = "vec_id",
    round_decimals: int = 6,
) -> DataFrame:
    """Spherical k-means (Lloyd's) over an embedding column — the iterative
    centroid learner for a real IVF index (label centroids are a stand-in).

    Per iteration: inline the k driver-side centroids as a literal argmax
    projection (map-only assignment — no crossJoin, no per-id groupBy, no
    join back), recompute per-cell means (posexplode + two-level agg). One
    job and two exchanges per iteration; only k rows ever cross to the
    driver.

    Determinism (and engine-neutrality for the oracle): init = the k
    lowest-id vectors; centroid components are rounded to
    ``round_decimals`` between iterations, so Spark's and another engine's
    avg accumulation order can't drift the trajectory apart bit-by-bit.
    A cell that loses all members disappears (classic Lloyd's behavior).
    """
    cents = _kmeans_centroid_rounds(df, k, iters, vec_col, id_col, round_decimals)
    return local_rows_df(df.sparkSession, cents, "cell bigint, centroid array<double>")


def build_ivf_index(
    df: DataFrame, centroids: DataFrame, path: str,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index: vectors written cell-partitioned.

    This is the build step a real ANN deployment amortizes over millions of
    queries — assign once, write ``partitionBy('cell')``, and every query
    after that PRUNES to nprobe cell directories at the parquet scan
    (PartitionFilters), touching n*nprobe/n_cells of the corpus I/O.

    Centroid tables are config-sized by contract (n_cells rows — probes
    already collect them to rank cells), so for moderate cell counts the
    assignment is the map-only literal argmax: no crossJoin, no per-id
    groupBy, no join of vectors back onto assignments — the only
    exchange left is the write's repartition("cell"). Beyond 256 cells
    the literal expression would bloat codegen, so the broadcast-join
    form remains the fallback."""
    cents = [(int(r["cell"]), list(r["centroid"])) for r in centroids.collect()]
    if 0 < len(cents) <= 256:
        assigned_df = df.withColumn("cell", _centroid_argmax(cents, vec_col)["cell"])
    else:
        assigned = ivf_assign(df, centroids, vec_col, id_col).select(id_col, "cell")
        assigned_df = df.join(assigned, id_col)
    (
        assigned_df
        .repartition("cell")
        .write.mode("overwrite")
        # full index rebuild: pin STATIC (a rebuild with fewer/renumbered
        # cells must not leave stale cell partitions)
        .option("partitionOverwriteMode", "static")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark, index_path: str, centroids: DataFrame, query_vec: list[float],
    k: int = 10, nprobe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """IVF query over a materialized index: rank cells by centroid
    similarity (a centroids-only driver job — n_cells rows, never the
    corpus), then scan ONLY the top ``nprobe`` cell partitions (the
    ``cell IN (...)`` filter prunes at the scan) and rank by exact cosine.

    Per-query cost: nprobe/n_cells of the index I/O + a map-only top-k —
    no shuffle, no re-assignment. This is the 100 TB path; the one-shot
    :func:`ivf_topk` below trades index reuse for zero setup."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    top_cells = [
        r["cell"]
        for r in centroids.select("cell", cosine(F.col("centroid"), q).alias("s"))
        # asc(cell) tie-break matches ivf_topk_indexed_batch — equidistant
        # centroids must not make single vs batched probes diverge
        .orderBy(F.desc("s"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    ]
    idx = spark.read.parquet(index_path).filter(F.col("cell").isin(top_cells))
    sim = cosine(F.col(vec_col), q)
    return (
        idx.select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_topk_indexed_batch(
    spark, index_path: str, centroids: DataFrame, queries: DataFrame,
    k: int = 10, nprobe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
    query_id_col: str = "query_id", query_vec_col: str = "query_vec",
) -> DataFrame:
    """Serve a query DataFrame against a materialized IVF index in ONE job:
    (query_id, vec_id, sim) with the top-``k`` per query.

    The scalable form of :func:`ivf_topk_indexed` (one vector, cells ranked
    by a driver-side collect, one job per probe). Here cell ranking is a
    broadcast crossJoin of queries x centroids (|Q| x n_cells rows — both
    config-sized) with a per-query rank-limit window picking ``nprobe``
    cells; the (query, cell) pairs broadcast into an equi-join on ``cell``
    against ONE index scan, and the per-query top-k is a second rank-limit
    window. No driver-side cell ranking, no per-query job; dynamic
    partition pruning can drop unprobed cell directories."""
    from pyspark.sql import Window

    ranked = queries.crossJoin(F.broadcast(centroids)).select(
        F.col(query_id_col), F.col(query_vec_col), F.col("cell"),
        cosine(F.col(query_vec_col), F.col("centroid")).alias("__csim"),
    )
    wc = Window.partitionBy(query_id_col).orderBy(F.desc("__csim"), F.asc("cell"))
    probe = (
        ranked.withColumn("__rn", F.row_number().over(wc))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, query_vec_col, "cell")
    )
    idx = spark.read.parquet(index_path)
    cand = idx.join(F.broadcast(probe), idx["cell"] == probe["cell"])
    sim = cosine(idx[vec_col], probe[query_vec_col])
    sel = cand.select(
        probe[query_id_col].alias(query_id_col),
        idx[id_col].alias(id_col),
        sim.alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        sel.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_topk(
    df: DataFrame, centroids: DataFrame, query_vec: list[float], k: int = 10,
    nprobe: int = 2, vec_col: str = "embedding", id_col: str = "vec_id",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """One-shot IVF query (no materialized index): rank cells by centroid
    similarity, scan the top ``nprobe`` cells only, exact cosine within.

    Pass ``assigned`` (a cached/materialized ivf_assign output) when issuing
    multiple queries — otherwise each call re-assigns the corpus, which
    defeats IVF's purpose. For a standing index use
    :func:`build_ivf_index` + :func:`ivf_topk_indexed` (partition-pruned)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    top_cells = [
        r["cell"]
        for r in centroids.select("cell", cosine(F.col("centroid"), q).alias("s"))
        .orderBy(F.desc("s"), F.asc("cell"))
        .limit(nprobe)
        .collect()
    ]
    if assigned is None:
        assigned = ivf_assign(df, centroids, vec_col, id_col)
    sim = cosine(F.col(vec_col), q)
    return (
        df.join(assigned.filter(F.col("cell").isin(top_cells)).select(id_col), id_col, "left_semi")
        .select(F.col(id_col), sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cc_iters: int | None = 3,
    sim_decimals: int = 6,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    paper): cluster embeddings with k-means, compare pairs only WITHIN a
    cluster, group near-duplicates (cosine >= threshold) into connected
    components, and KEEP the member farthest from its cluster centroid —
    the paper's diversity-preserving pick (the centroid-hugging copies are
    the redundant ones).

    Returns one row per input vector: (id, cell, centroid_sim, component,
    keep). Singletons (no near-dup) keep trivially; in a dup component
    exactly one row has keep=true (min rounded centroid_sim, ties broken
    by lowest id — rounding to ``sim_decimals`` keeps the pick
    engine-neutral for the SQL oracle).

    Scale shape: the all-pairs O(n^2) is fenced to O(sum_c |c|^2) by the
    cluster equi-join — with balanced cells that's n^2/k, and the join is
    a plain shuffle join AQE can split further. A pathologically hot cell
    is the residual skew risk: raise k, or sub-split hot cells with a
    hyperplane bit (hyperplane_signature) before pairing — same defense
    as the minhash doc-frequency cap, applied to vector space. Embeddings
    shuffle once into their cell; components carry only ids.

    ``cc_iters`` bounds min-label propagation: a FIXED count keeps the
    trajectory deterministic for an external SQL oracle, but UNDER-MERGES
    any dup component whose graph DIAMETER exceeds it (a chain
    a~b~c~d~e at diameter 4 with cc_iters=3 splits into two components,
    each electing its own keep=true row). For production runs pass
    ``cc_iters=None`` — connected_components' run-to-convergence mode
    (changed-label count per round, capped) — and keep the fixed count
    only where an oracle must replay the exact trajectory.
    """
    from shovel_spark.operators.dedup import connected_components

    if centroids is None:
        # k-means trajectory ends as a k-row driver list → the final
        # assignment is the same literal argmax projection the iterations
        # use: map-only, no crossJoin/groupBy exchange, and no join of
        # vectors back onto assignments (two shuffles removed vs the DF
        # path below). localCheckpoint: the assigned frame feeds BOTH
        # sides of the in-cell pair join plus the labeling join — without
        # it the scan + k cosines re-run once per consumer.
        cents_list = _kmeans_centroid_rounds(df, k, iters, vec_col, id_col, 6)
        best = _centroid_argmax(cents_list, vec_col)
        vecs = df.select(
            F.col(id_col),
            F.col(vec_col),
            best["cell"].alias("cell"),
            best["sim"].alias("centroid_sim"),
            l2_norm(F.col(vec_col)).alias("__norm"),
        ).localCheckpoint(eager=False)
        assigned = vecs.select(id_col, "cell", "centroid_sim")
    else:
        assigned = ivf_assign(df, centroids, vec_col, id_col)  # (id, cell, centroid_sim)
        vecs = df.select(
            F.col(id_col), F.col(vec_col), l2_norm(F.col(vec_col)).alias("__norm")
        ).join(assigned, id_col)
    x, y = vecs.alias("x"), vecs.alias("y")
    # cosine = dot / (norm_x * norm_y) with the norms HOISTED into the
    # per-vector projection above (same formula, same op order as
    # :func:`cosine`, so results are bit-identical) — the pair join then
    # runs ONE dot per candidate instead of dot + both norms, and that
    # dot is the codegen-unrolled fast_dot when the corpus dimension is
    # probeable (19.8 s -> 6.2 s -> sub-second on the in-cell pair stage
    # at sf0.1, ~0.5M candidates)
    pdim = _probe_dim(df, vec_col)
    pair_dot = (
        fast_dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}"), pdim)
        if pdim
        else dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}"))
    )
    sim = pair_dot / (F.col("x.__norm") * F.col("y.__norm"))
    pairs = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    comp = connected_components(pairs, iters=cc_iters)  # (id, component)
    rsim = F.round(F.col("centroid_sim"), sim_decimals)
    labeled = (
        assigned.join(comp.withColumnRenamed("id", id_col), id_col, "left")
        .withColumn("component", F.coalesce(F.col("component"), F.col(id_col)))
        .withColumn("centroid_sim", rsim)
    )
    # keep = the component's (min centroid_sim, min id) member: one
    # groupBy for the winner per component, then an equi-join back — no
    # window over a potentially huge component
    winner = F.struct(F.col("centroid_sim"), F.col(id_col).alias("wid"))
    keep = (
        labeled.groupBy("component")
        .agg(F.min(winner).alias("w"))
        .select("component", F.col("w.wid").alias("__keep_id"))
    )
    return (
        labeled.join(keep, "component")
        .select(
            id_col,
            "cell",
            "centroid_sim",
            "component",
            (F.col(id_col) == F.col("__keep_id")).alias("keep"),
        )
    )


def margin_mine(
    a: DataFrame,
    b: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    round_cos: int | None = 9,
    round_margin: int | None = 4,
) -> DataFrame:
    """Margin-based parallel-corpus mining (Artetxe & Schwenk 2019 — the
    CCMatrix/LASER criterion): score every cross-set pair by its cosine
    NORMALIZED by the mean similarity of the two endpoints' k-NN
    neighborhoods::

        margin(x, y) = cos(x, y) / ((avg_k(x) + avg_k(y)) / 2)

    and keep MUTUAL-best pairs above ``threshold``. Raw cosine alone
    over-selects hubs (vectors close to everything); the margin asks
    "is y closer to x than x's OTHER neighbors are?" in both directions.
    The standard tool for mining bitext / aligned multimodal pairs from
    two embedded corpora.

    ``candidates`` — optional (a_id, b_id) pair fence. None means the
    full cross product: correct for one bucket, a scale-killer corpus
    wide. At 100 TB fence first (build_lsh_index / ivf cells: mine within
    matching buckets), exactly like semantic_dedup's cell fence; the
    margin then normalizes by the IN-FENCE neighborhood, the published
    fast-mining setup.

    ``round_cos`` / ``round_margin`` quantize before every ranking so two
    engines elect identical pairs (floats differing in the last ulp
    cannot flip an ordering at 1e-9 / 1e-4 granularity); None keeps full
    precision. Returns (a_id, b_id, cos, margin), mutual-best rows only.
    """
    from pyspark.sql import Window

    # norms hoisted per-vector (identical formula/op order to cosine(), so
    # scores are bit-identical): the pair stage folds each 64-dim array
    # once instead of three times
    av = a.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("__va"),
        l2_norm(F.col(vec_col)).alias("__norm_a"),
    )
    bv = b.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("__vb"),
        l2_norm(F.col(vec_col)).alias("__norm_b"),
    )
    if candidates is None:
        paired = av.crossJoin(F.broadcast(bv))
    else:
        paired = candidates.select("a_id", "b_id").join(av, "a_id").join(
            F.broadcast(bv), "b_id"
        )
    pdim = _probe_dim(a, vec_col)
    pair_dot = (
        fast_dot(F.col("__va"), F.col("__vb"), pdim)
        if pdim
        else dot(F.col("__va"), F.col("__vb"))
    )
    cos = pair_dot / (F.col("__norm_a") * F.col("__norm_b"))
    if round_cos is not None:
        cos = F.round(cos, round_cos)
    pairs = paired.select("a_id", "b_id", cos.alias("cos"))
    wa = Window.partitionBy("a_id").orderBy(F.desc("cos"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("cos"), F.asc("a_id"))
    ranked = pairs.withColumn("__ra", F.row_number().over(wa)).withColumn(
        "__rb", F.row_number().over(wb)
    )
    avg_a = (
        ranked.filter(F.col("__ra") <= k)
        .groupBy("a_id")
        .agg(F.avg("cos").alias("__na"))
    )
    avg_b = (
        ranked.filter(F.col("__rb") <= k)
        .groupBy("b_id")
        .agg(F.avg("cos").alias("__nb"))
    )
    margin = F.col("cos") / ((F.col("__na") + F.col("__nb")) / F.lit(2.0))
    if round_margin is not None:
        margin = F.round(margin, round_margin)
    m = (
        ranked.join(avg_a, "a_id")
        .join(avg_b, "b_id")
        .withColumn("margin", margin)
    )
    wma = Window.partitionBy("a_id").orderBy(F.desc("margin"), F.asc("b_id"))
    wmb = Window.partitionBy("b_id").orderBy(F.desc("margin"), F.asc("a_id"))
    return (
        m.withColumn("__ba", F.row_number().over(wma))
        .withColumn("__bb", F.row_number().over(wmb))
        .filter(
            (F.col("__ba") == 1)
            & (F.col("__bb") == 1)
            & (F.col("margin") > F.lit(threshold))
        )
        .select("a_id", "b_id", "cos", "margin")
    )

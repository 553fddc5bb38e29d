"""Deduplication operators for training-data pipelines — exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

All shuffle-conscious (SURVEY.md "would this survive 100×?"):
  - exact dedup: one hash-shuffle on a 16-byte fingerprint, never on text;
  - MinHash/LSH: candidate generation is an equi-join on (band, signature)
    buckets — the only pairs materialized are bucket collisions, not n²;
  - super-common shingles are dropped (document-frequency cap) so one boiler-
    plate phrase can't create a quadratic hot bucket (skew defense);
  - verification joins fetch shingle sets only for candidate pairs.

No Python in any of these paths — everything is Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shovel_spark.session import local_rows_df

from shovel_spark.functions.textstats import fingerprint, tokens


# --- exact -----------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical row (lowest id) per normalized-content fingerprint.

    groupBy on the md5 fingerprint: the shuffle carries (16-byte key, id),
    not document bodies; survivors join back to fetch their rows.
    """
    fp = df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("__fp"))
    keep = fp.groupBy("__fp").agg(F.min(id_col).alias(id_col)).drop("__fp")
    return df.join(keep, id_col, "left_semi")


def split_paragraph_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """THE paragraph convention, defined once (used by paragraph_dedup
    and quality.remove_boilerplate): consecutive ``para_words``-word
    windows over the whitespace tokens. Returns (with_counts, paras):
    with_counts = (id, __np) one row per input doc; paras = (id, idx,
    __pw array<string>) one row per window. Swapping the splitter for
    ``split(text, '\\n\\n')`` on real pages happens HERE and nowhere
    else."""
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    n = F.size("__w")
    n_paras = (
        F.when(n > 0, F.ceil(n / F.lit(para_words))).otherwise(F.lit(0)).cast("long")
    )
    with_counts = base.withColumn("__np", n_paras)
    paras = (
        with_counts.filter(F.col("__np") > 0)
        .select(
            F.col(id_col),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), (F.col("__np") - 1).cast("int")),
                    lambda i: F.slice("__w", i * para_words + 1, para_words),
                )
            ).alias("idx", "__pw"),
        )
    )
    return with_counts, paras


def reassemble_paragraphs(
    with_counts: DataFrame,
    kept: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild (id, n_paras, n_kept, text) from surviving (id, idx,
    __para) rows — the shared finalization of every paragraph-level
    operator: per-doc sort_array reassembly (bounded by one document's
    paragraph count), '' for docs that lost everything."""
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "__para"))),
                lambda s: s["__para"],
            ),
            " ",
        ).alias("__text"),
    )
    return (
        with_counts.select(id_col, F.col("__np").alias("n_paras"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_paras",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("__text"), F.lit("")).alias(text_col),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    para_words: int = 10,
) -> DataFrame:
    """Paragraph-level exact dedup WITH document reassembly — the
    RefinedWeb / Gopher line-dedup granularity between whole-document
    exact dedup and span excision: a boilerplate paragraph shared by a
    million pages survives in exactly ONE document and is cut from every
    other, while the rest of each document stays intact and in order.
    Paragraphs here are consecutive ``para_words``-word windows (the
    synthetic corpus has no newline structure; swap the splitter for
    ``split(text, '\\n\\n')`` on real pages — nothing else changes).

    Policy: the GLOBAL first occurrence (lowest (id, idx)) of each
    distinct paragraph is kept; every later occurrence — across documents
    or repeated within one — is dropped. Returns one row per input doc:
    (id, n_paras, n_kept, text) where ``text`` is the surviving
    paragraphs rejoined in original order ('' when everything was cut).

    Scale shape: the election shuffles (16-byte md5, id, idx) — never
    paragraph text; it's one map-side-combinable min-struct groupBy on
    the hash, then an equi-join back and a per-doc sort_array reassembly
    (bounded by a single document's paragraph count). No windows over
    content keys, no driver state.
    """
    with_counts, windows = split_paragraph_windows(df, text_col, id_col, para_words)
    paras = windows.select(
        id_col, "idx", F.array_join("__pw", " ").alias("__para")
    ).withColumn("__h", F.md5("__para"))
    firsts = paras.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("fid"), F.col("idx").alias("fidx"))).alias("__w1")
    )
    kept = (
        paras.join(firsts, "__h")
        .filter((F.col(id_col) == F.col("__w1.fid")) & (F.col("idx") == F.col("__w1.fidx")))
        .select(id_col, "idx", "__para")
    )
    return reassemble_paragraphs(with_counts, kept, text_col, id_col)


# --- shingles (shared by MinHash / Jaccard) ---------------------------------

def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id, shingle) pairs: distinct k-word shingles per document.

    ``max_doc_freq`` drops shingles appearing in more than that many docs —
    boilerplate phrases otherwise create quadratic join buckets at scale.

    The token array is materialized behind a projection boundary first:
    expressions inside higher-order lambdas get NO common-subexpression
    elimination, so an inlined split() would re-tokenize the document once
    per shingle (measured 15× slower).
    """
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    n = F.size("__w")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice("__w", i, k), " "),
        )
    )
    sh = base.select(F.col(id_col), F.explode(shingles).alias("shingle"))
    if max_doc_freq is not None:
        # groupBy + semi-join, NOT a window: the window form shuffles every
        # (id, shingle) row uncombined and SORTS it per shingle — a hot
        # boilerplate shingle becomes one giant spilling window partition
        # (the exact skew this cap exists to defuse). groupBy pre-aggregates
        # map-side (the count shuffle carries partial counts, not rows) and
        # the semi-join gets AQE skew handling.
        rare = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(rare, "shingle", "left_semi")
    return sh


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: (corpus id, distinct k-gram overlap count)
    for every corpus document sharing at least ``min_overlap`` distinct
    k-word shingles with the benchmark SET (the union of all benchmark
    documents' shingles — overlap may be spread across several eval docs;
    strictly more conservative than a per-benchmark-doc threshold) — the
    filter an LLM training pipeline runs so eval data doesn't leak into
    the training set.

    Shape: shingle both sides, equi-join on the shingle (the benchmark side
    is tiny — a few thousand eval docs — so Spark broadcasts it; corpus
    shingles stream map-side, nothing n^2), count distinct matched shingles
    per corpus doc. Corpus text bodies never shuffle.
    """
    c_sh = shingle_table(corpus, text_col, id_col, k)
    b_sh = (
        shingle_table(benchmark, text_col, id_col, k)
        .select("shingle")
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("overlap"))
        .filter(F.col("overlap") >= min_overlap)
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    m_bits: int = 65536,
    bloom_k: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Two-tier benchmark decontamination for when the eval suite is too
    large to broadcast as an exact shingle set: tier 1 compresses the
    benchmark's distinct k-word shingles into an ``m_bits``-bit Bloom
    filter (fixed state however many eval docs) and probes every corpus
    shingle MAP-SIDE — no false negatives, so no contaminated doc can
    slip past; tier 2 settles the Bloom's false-positive trickle with an
    exact shingle semi-join that only ever touches the (tiny) shortlisted
    candidate shingles, not the whole corpus.

    Returns (id, candidate_shingles, exact_shingles, contaminated) for
    every doc the Bloom shortlists: candidate_shingles counts tier-1
    probe hits, exact_shingles the true benchmark overlaps among them,
    contaminated = exact_shingles >= min_overlap. Rows where
    exact_shingles < candidate_shingles show the absorbed false
    positives — the cost knob m_bits trades their volume against state.

    Shape at 100 TB: tier 1 is one broadcast row + a map-only filter over
    the corpus shingle stream (contamination_overlap's broadcast of the
    raw shingle set stops fitting somewhere in the millions of eval
    shingles; the Bloom never grows); tier 2's shuffle carries only
    shortlisted shingles."""
    from shovel_spark.operators.sketches import bloom_build, bloom_filter

    # both b_sh (bloom build + tier-2 join) and cand (two count branches)
    # are consumed twice; without materialization Spark re-evaluates the
    # whole upstream subtree per consumer — i.e. TWO corpus shingling
    # passes, defeating the one-pass claim. localCheckpoint pins them:
    # b_sh is the benchmark shingle set, cand only the shortlisted rows.
    b_sh = (
        shingle_table(benchmark, text_col, id_col, k)
        .select("shingle")
        .distinct()
        .localCheckpoint()
    )
    bloom = bloom_build(b_sh, "shingle", m_bits=m_bits, k=bloom_k)
    c_sh = shingle_table(corpus, text_col, id_col, k)
    cand = bloom_filter(
        c_sh, bloom, "shingle", m_bits=m_bits, k=bloom_k
    ).localCheckpoint()
    cand_counts = cand.groupBy(id_col).agg(
        F.count_distinct("shingle").alias("candidate_shingles")
    )
    exact_counts = (
        cand.join(b_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("exact_shingles"))
    )
    return (
        cand_counts.join(exact_counts, id_col, "left")
        .select(
            id_col,
            "candidate_shingles",
            F.coalesce("exact_shingles", F.lit(0)).alias("exact_shingles"),
        )
        .withColumn("contaminated", F.col("exact_shingles") >= min_overlap)
    )


# --- n-gram Jaccard ----------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for pairs with shingle-Jaccard ≥ threshold.

    Inverted-index self-join: pairs only materialize where a shingle is
    shared. Exact (not approximate) — use MinHash/LSH below when even the
    inverted index is too hot.
    """
    sh = shingle_table(df, text_col, id_col, k, max_doc_freq)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --- MinHash + LSH -----------------------------------------------------------

#: Hash families for MinHash/SimHash. 'xxhash64' is the production default
#: (JVM-native, fastest). 'md5' derives the hash from md5 — bit-identical in
#: every engine (DuckDB, Trino, ...) so the full chain is oracle-checkable;
#: MinHash only needs a uniform hash, not a specific one, so the choice is
#: a verification knob, not a semantic change.

def _seeded_hash(family: str, seed: int, col: Column) -> Column:
    if family == "xxhash64":
        return F.xxhash64(F.lit(seed), col)
    if family == "md5":
        # min() over md5 hex strings: lexicographic on a uniform hex string
        # is as order-uniform as numeric min over a 64-bit int
        return F.md5(F.concat(F.lit(f"{seed}:"), col))
    raise ValueError(f"unknown hash family: {family!r}")


def minhash_signatures(
    sh: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, family: str = "xxhash64"
) -> DataFrame:
    """(id, sig: array<long|string>) — num_hashes MinHash values per document.

    One aggregation: min over hash(seed_i, shingle) per seed, computed
    as an array fold — no explode of the hash family.
    """
    hashes = F.array(
        *[_seeded_hash(family, i, F.col("shingle")) for i in range(num_hashes)]
    )
    return (
        sh.select(F.col(id_col), hashes.alias("h"))
        .groupBy(id_col)
        .agg(
            F.array(
                *[F.min(F.element_at("h", i + 1)).alias(f"m{i}") for i in range(num_hashes)]
            ).alias("sig")
        )
    )


def band_buckets(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    num_hashes: int | None = None,
    family: str = "xxhash64",
) -> DataFrame:
    """(id, band, bucket) rows — each doc's banded signature slices hashed
    to compact bucket keys. The LSH join table: docs colliding on any
    (band, bucket) are candidates. Shared by the one-shot
    :func:`lsh_candidate_pairs` and the standing index
    (:func:`build_minhash_index` / :func:`incremental_minhash_pairs`)."""
    n = num_hashes if num_hashes is not None else sigs.select(F.size("sig")).first()[0]
    rows_per_band = max(1, n // bands)

    def _bucket(b: int) -> Column:
        slice_key = F.concat_ws(
            ",",
            *[
                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                for r in range(rows_per_band)
            ],
        )
        # compact 16-byte key either way; md5 family keeps it engine-neutral
        return F.md5(slice_key) if family == "md5" else F.xxhash64(slice_key)

    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _bucket(b).alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    num_hashes: int | None = None,
    family: str = "xxhash64",
) -> DataFrame:
    """Banded LSH: docs sharing any band-slice of their signature become a
    candidate pair. Join key is (band, hash-of-slice) — equi-join, shuffle
    on a compact key, AQE handles residual bucket skew.

    Pass ``num_hashes`` (the signature length) explicitly — omitting it
    costs a driver-side .first() job just to learn the array size."""
    buckets = band_buckets(sigs, id_col, bands, num_hashes, family)
    x, y = buckets.alias("x"), buckets.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_doc_freq: int | None = None,
    family: str = "xxhash64",
) -> DataFrame:
    """Full MinHash→LSH→verify chain: candidates from band buckets, then
    exact Jaccard verification on candidates only.

    The shingle table feeds four consumers (signatures, per-doc sizes,
    both sides of the verification join). Deliberately NOT checkpointed:
    re-deriving it per consumer keeps every branch fully pipelined, and
    an A/B at sf0.1 measured the checkpointed form 15-25% SLOWER
    end-to-end (the materialization barrier costs more than the repeated
    tokenize+explode, which fuses into each consumer's first stage)."""
    sh = shingle_table(df, text_col, id_col, k, max_doc_freq)
    sigs = minhash_signatures(sh, id_col, num_hashes, family)
    cand = lsh_candidate_pairs(sigs, id_col, bands, num_hashes, family)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        cand.join(a, cand.id_a == F.col(f"a.{id_col}"))
        .join(b, (cand.id_b == F.col(f"b.{id_col}")) & (F.col("a.shingle") == F.col("b.shingle")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    return (
        common.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _shingle_key(shingle: Column, family: str) -> Column:
    """Compact per-shingle key for index storage: the shingle STRING never
    lands on disk or in a shuffle (at 100 TB the shingle universe is
    billions of short strings). md5 keeps it engine-neutral for oracles;
    xxhash64 is the compact production default. Set cardinalities (and
    hence Jaccard) survive hashing — collisions are negligible and
    deterministic."""
    return F.md5(shingle) if family == "md5" else F.xxhash64(shingle)


def build_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    family: str = "xxhash64",
    max_doc_freq: int | None = None,
) -> None:
    """Materialize the standing MinHash index a 100 TB corpus amortizes:
    sign the corpus ONCE and store two compact tables under ``path`` —
    ``buckets/`` (id, band, bucket: the LSH join keys, band-partitioned)
    and ``shingles/`` (id, shingle key: what exact-Jaccard verification
    needs). Document text never enters the index.

    ``max_doc_freq`` applies the hot-shingle document-frequency cap
    (boilerplate skew defense, same semantics as minhash_dedup_pairs)
    BEFORE signatures and before storing shingle keys, and additionally
    stores two small artifacts so incremental probes stay consistent:

    - ``hot_df/`` — (shk, df) for every shingle the cap dropped. Tiny
      (over-cap shingles only), but it lets incremental_minhash_pairs
      compute the EXACT corpus+delta doc frequency for capped shingles —
      without it a build-capped shingle would look rare again to a probe
      (its index rows are gone) and re-enter the join as a quadratic
      bucket.
    - ``meta/`` — index parameters (k, num_hashes, bands, family,
      max_doc_freq) so probes default to the build-time cap instead of
      silently probing uncapped.

    After this, deduping a new crawl batch is :func:`incremental_minhash_pairs`
    — delta-sized work joined against these tables — instead of re-signing
    the whole corpus per batch (the full-recompute cost this index
    amortizes away; shovel's queue replays deltas the same way,
    reference: src/queues/batch.js:84-95)."""
    _write_minhash_index(
        df, path, "overwrite", text_col, id_col, k, num_hashes, bands, family,
        max_doc_freq=max_doc_freq,
    )


def append_to_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    family: str = "xxhash64",
    batch: int | None = None,
    max_doc_freq: int | None = None,
) -> None:
    """Append a batch's buckets and shingle keys to a standing index built
    with the SAME (k, num_hashes, bands, family) — the survivors-only
    update an ingest stream performs after dropping a batch's near-dups
    (dup docs must not pollute the index with their buckets).

    Pass ``batch`` (a micro-batch id) for IDEMPOTENT updates: the rows
    land in a ``__batch=<id>`` partition written with dynamic partition
    overwrite, so an at-least-once replay of the same batch REPLACES its
    own partitions instead of duplicating them — required under
    foreachBatch, where a crash between write and checkpoint commit
    replays the batch. Plain append (batch=None) is for one-shot jobs
    that manage their own exactly-once.

    ``max_doc_freq`` caps hot shingles WITHIN this batch (deterministic in
    the batch's rows, so replay-idempotent). A per-batch cap is the skew
    fuse for the batch's own boilerplate; it intentionally does NOT
    recount across batches — a periodic :func:`build_minhash_index`
    rebuild re-applies the corpus-wide cap exactly."""
    _write_minhash_index(
        df, path, "append", text_col, id_col, k, num_hashes, bands, family, batch,
        max_doc_freq=max_doc_freq,
    )


def _write_minhash_index(
    df: DataFrame,
    path: str,
    mode: str,
    text_col: str,
    id_col: str,
    k: int,
    num_hashes: int,
    bands: int,
    family: str,
    batch: int | None = None,
    max_doc_freq: int | None = None,
) -> None:
    # both index tables derive from the shingle table: checkpoint so the
    # corpus really is scanned/shingled ONCE per build, not once per write
    sh_raw = shingle_table(df, text_col, id_col, k).localCheckpoint(eager=False)
    if max_doc_freq is not None:
        # corpus-wide cap for a full build; batch-local cap for appends.
        # groupBy + anti-join (NOT a window) for the same skew reasons as
        # shingle_table's cap; rows are distinct per (doc, shingle), so
        # count(*) == doc frequency.
        dfreq = (
            sh_raw.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .localCheckpoint(eager=False)
        )
        sh = sh_raw.join(dfreq.select("shingle"), "shingle", "left_anti")
        if batch is None and mode == "overwrite":
            # persist the dropped shingles' doc frequencies (hot keys only —
            # tiny) so incremental probes can reconstruct exact corpus+delta
            # totals for shingles whose index rows no longer exist
            (
                dfreq.select(
                    _shingle_key(F.col("shingle"), family).alias("shk"),
                    F.col("df"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{path}/hot_df")
            )
    else:
        sh = sh_raw
        if batch is None and mode == "overwrite":
            # an UNCAPPED rebuild must clear any prior build's hot_df —
            # stale totals would otherwise feed a later explicitly-capped
            # probe's doc-frequency sums from a corpus that no longer exists
            shk_t = "string" if family == "md5" else "long"
            (
                local_rows_df(df.sparkSession, [], f"shk {shk_t}, df long")
                .write.mode("overwrite")
                .parquet(f"{path}/hot_df")
            )
    if batch is None and mode == "overwrite":
        spark = df.sparkSession
        meta = local_rows_df(
            spark,
            [(int(k), int(num_hashes), int(bands), str(family),
              None if max_doc_freq is None else int(max_doc_freq))],
            "k int, num_hashes int, bands int, family string, max_doc_freq int",
        )
        meta.coalesce(1).write.mode("overwrite").json(f"{path}/meta")
    sigs = minhash_signatures(sh, id_col, num_hashes, family)
    buckets = band_buckets(sigs, id_col, bands, num_hashes, family)
    keys = sh.select(F.col(id_col), _shingle_key(F.col("shingle"), family).alias("shk"))
    if batch is None:
        # full rebuild: pin STATIC so a rebuild over a shrunk corpus can't
        # leave stale band partitions behind under a globally-dynamic session
        (
            buckets.write.mode(mode)
            .option("partitionOverwriteMode", "static")
            .partitionBy("band")
            .parquet(f"{path}/buckets")
        )
        keys.write.mode(mode).parquet(f"{path}/shingles")
    else:
        # batch-keyed partitions + dynamic overwrite = replay-idempotent.
        # The mode is pinned PER-WRITE: Spark's default is static, under
        # which each batch's write would delete every other __batch
        # partition of the standing index — silent data loss for any
        # caller that didn't happen to set the session-level conf.
        (
            buckets.withColumn("__batch", F.lit(int(batch)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch", "band")
            .parquet(f"{path}/buckets")
        )
        (
            keys.withColumn("__batch", F.lit(int(batch)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(f"{path}/shingles")
        )


def _read_index_cap(spark, index_path: str) -> int | None:
    """Build-time ``max_doc_freq`` from ``{index_path}/meta`` (None for
    uncapped or pre-meta indexes). JSON writes drop null fields, so an
    uncapped build's meta row simply lacks the column. Only missing-path /
    unreadable-schema (AnalysisException) means "no meta" — transient I/O
    failures must propagate, not silently disable the cap."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.read.json(f"{index_path}/meta").collect()
    except AnalysisException:
        return None
    if not rows:
        return None
    cap = rows[0].asDict().get("max_doc_freq")
    return None if cap is None else int(cap)


def _read_hot_df(spark, index_path: str, family: str):
    """(shk, __hdf) — stored doc frequencies of cap-dropped shingles.
    Totals are cumulative and appended over time (build row, then one row
    per delta that re-crossed the cap), so MAX per key is the latest exact
    total; SUM would double-count the build contribution. Missing table
    (uncapped or pre-cap index; AnalysisException only — real I/O errors
    propagate rather than silently undercounting totals) reads as empty."""
    from pyspark.errors import AnalysisException

    try:
        hot = spark.read.parquet(f"{index_path}/hot_df")
    except AnalysisException:
        shk_t = "string" if family == "md5" else "long"
        return local_rows_df(spark, [], f"shk {shk_t}, __hdf long")
    return hot.groupBy("shk").agg(F.max("df").alias("__hdf"))


def incremental_minhash_pairs(
    spark,
    index_path: str,
    new_df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    family: str = "xxhash64",
    update_index: bool = False,
    max_doc_freq: int | None | str = "index",
) -> DataFrame:
    """Near-dup pairs for a DELTA batch against a standing MinHash index
    (:func:`build_minhash_index`): every (id_a, id_b, jaccard) pair with
    at least one delta doc — delta x corpus collisions AND delta x delta —
    WITHOUT re-shingling or re-signing the corpus. The incremental form of
    :func:`minhash_dedup_pairs`: given the same (k, num_hashes, bands,
    family), its output equals the full-corpus run restricted to pairs
    involving the delta, up to negligible shingle-key collisions
    (verification Jaccard here is computed over hashed shingle keys, the
    full chain's over raw shingle strings — a 64-bit key collision inside
    one candidate doc could flip a borderline pair; parity pytest-asserted
    on collision-free fixtures).

    Scale shape: only the delta is shingled/signed; candidates come from
    one equi-join of delta buckets against the band-partitioned index
    buckets (shuffle carries 16-byte keys + ids); verification joins
    hashed shingle sets for candidate ids only. Daily-crawl cost is
    O(delta + collisions), not O(corpus).

    ``max_doc_freq`` — the hot-shingle cap. Default ``"index"`` reads the
    build-time cap from ``{index_path}/meta`` (falling back to uncapped for
    pre-meta indexes), so probes are consistent with the build by
    construction; pass an int to override or ``None`` to disable. The cap
    is EXACT against the current corpus+delta: a shingle's total doc
    frequency = stored ``hot_df`` count (build-capped shingles, whose
    index rows no longer exist) + its live index rows + its delta rows.
    Any shingle over the cap is excluded from delta signatures AND from
    both sides' verification sets — so boilerplate that only became hot
    WITH this delta is defused too, and the pair Jaccards match a full
    capped re-run (candidate recall can differ marginally for corpus docs
    whose build-time signatures included a shingle that crossed the cap
    later; the exact-Jaccard gate is unaffected). Once hot, a shingle
    stays capped for subsequent deltas (update_index appends its total to
    ``hot_df`` — conservative by design; a periodic rebuild recounts).

    Delta ids must be disjoint from indexed ids (a re-crawled URL should
    go through snapshot upsert first — operators/merge.py).
    ``update_index=True`` appends the delta's (capped) buckets and
    shingles after pair computation, so the next batch dedupes against
    corpus + this one.
    """
    if isinstance(max_doc_freq, str):
        if max_doc_freq != "index":
            raise ValueError(f"max_doc_freq: int, None or 'index', got {max_doc_freq!r}")
        max_doc_freq = _read_index_cap(spark, index_path)

    new_sh = shingle_table(new_df, text_col, id_col, k).withColumn(
        "shk", _shingle_key(F.col("shingle"), family)
    ).localCheckpoint(eager=False)
    new_keys = new_sh.select(F.col(id_col), "shk")

    # select the logical columns only: a batch-keyed index (streaming
    # ingest) carries an extra __batch partition column that must not leak
    # into the pair math or the unionByName with delta-side keys
    idx_buckets = spark.read.parquet(f"{index_path}/buckets").select(
        id_col, "band", "bucket"
    )
    idx_keys = spark.read.parquet(f"{index_path}/shingles").select(id_col, "shk")

    delta_ids_pre = new_keys.select(id_col).distinct()
    # replay safety: a delta doc already appended to the index must not
    # count twice in doc frequencies or verification sets
    idx_live = idx_keys.join(delta_ids_pre, id_col, "left_anti")

    if max_doc_freq is not None:
        hot_stored = _read_hot_df(spark, index_path, family).localCheckpoint(eager=False)
        # a shingle capped by a PREVIOUS delta (update_index appended its
        # total to hot_df) still has its build-era rows in shingles/ —
        # they must leave the verification sets even when the current
        # delta doesn't contain the shingle, or set sizes inflate and
        # borderline pairs deflate below threshold vs a full capped re-run
        idx_live = idx_live.join(hot_stored.select("shk"), "shk", "left_anti")
        # beyond already-stored hot keys, a shingle can be over-cap NOW
        # only if the delta contains it (only delta rows grow a total) —
        # so fresh totals need computing for DELTA keys only: semi-join
        # the index rows down to delta keys BEFORE the groupBy (the
        # aggregation is then O(delta-matching rows), keeping the
        # documented O(delta + collisions) probe cost).
        delta_key_set = new_keys.select("shk").distinct()
        idx_df = (
            idx_live.join(delta_key_set, "shk", "left_semi")
            .groupBy("shk")
            .agg(F.count("*").alias("__idf"))
        )
        hot_now = (
            new_keys.groupBy("shk").agg(F.count("*").alias("__ddf"))
            .join(idx_df, "shk", "left")
            .join(hot_stored, "shk", "left")
            .filter(
                F.col("__ddf")
                + F.coalesce(F.col("__idf"), F.lit(0))
                + F.coalesce(F.col("__hdf"), F.lit(0))
                > max_doc_freq
            )
            .localCheckpoint(eager=False)
        )
        new_sh = new_sh.join(hot_now.select("shk"), "shk", "left_anti")
        new_keys = new_sh.select(F.col(id_col), "shk")
        idx_live = idx_live.join(hot_now.select("shk"), "shk", "left_anti")

    new_sigs = minhash_signatures(new_sh, id_col, num_hashes, family)
    new_buckets = band_buckets(new_sigs, id_col, bands, num_hashes, family).localCheckpoint(
        eager=False
    )

    nb, ib = new_buckets.alias("n"), idx_buckets.alias("i")
    cross = (
        nb.join(
            ib,
            (F.col("n.band") == F.col("i.band"))
            & (F.col("n.bucket") == F.col("i.bucket"))
            # a delta doc replayed after its own index append (foreachBatch
            # at-least-once) matches itself — a self-pair is never a dup
            & (F.col(f"n.{id_col}") != F.col(f"i.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"i.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"i.{id_col}")).alias("id_b"),
        )
    )
    x, y = new_buckets.alias("x"), new_buckets.alias("y")
    within = x.join(
        y,
        (F.col("x.band") == F.col("y.band"))
        & (F.col("x.bucket") == F.col("y.bucket"))
        & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
    ).select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
    cand = cross.unionByName(within).distinct()

    # verification over the UNION of stored + delta shingle keys — sizes and
    # intersections computed exactly as minhash_dedup_pairs does on strings.
    # idx_live is already anti-joined against delta ids (after a
    # foreachBatch replay the delta's docs are ALREADY in the index, and
    # counting their keys from both sides would double set sizes and
    # intersections — jaccard inflated past the threshold, so a replay
    # could drop docs the original run kept) and already hot-capped, so
    # both sides' sets are defined identically.
    all_keys = idx_live.unionByName(new_keys)
    sizes = all_keys.groupBy(id_col).agg(F.count("*").alias("n"))
    a, b = all_keys.alias("a"), all_keys.alias("b")
    common = (
        cand.join(a, cand.id_a == F.col(f"a.{id_col}"))
        .join(b, (cand.id_b == F.col(f"b.{id_col}")) & (F.col("a.shk") == F.col("b.shk")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c"))
    pairs = (
        common.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    if update_index:
        # materialize pairs BEFORE appending — the append must not race the
        # candidate join's own read of the index
        pairs = pairs.localCheckpoint()
        new_buckets.write.mode("append").partitionBy("band").parquet(f"{index_path}/buckets")
        new_keys.write.mode("append").parquet(f"{index_path}/shingles")
        if max_doc_freq is not None:
            # record shingles that crossed the cap WITH this delta (their
            # exact corpus+delta totals) so the next delta sees them as hot
            # even though neither side stores their per-doc rows anymore.
            # ONLY keys with no stored row (__hdf null) are appended: an
            # already-stored hot key's total would otherwise re-add this
            # delta's count on an at-least-once replay (its first append
            # already included it) and MAX would surface the inflated
            # value. Skipping stored keys keeps totals exact as "count when
            # the key crossed the cap" — the monotone hotness decision
            # (hdf alone > cap) is unaffected.
            (
                hot_now.filter(F.col("__hdf").isNull())
                .select(
                    "shk",
                    (F.col("__ddf") + F.coalesce(F.col("__idf"), F.lit(0))).alias("df"),
                )
                .coalesce(1)
                .write.mode("append")
                .parquet(f"{index_path}/hot_df")
            )
    return pairs


# --- SimHash -----------------------------------------------------------------

def simhash(text: Column, bits: int = 64, family: str = "xxhash64") -> Column:
    """SimHash over word tokens: per bit, sign of the sum of token-hash bits.

    Vectorized as an aggregate over the token array — bit i of hash(token)
    contributes +1/-1; the sign vector packs back into one long.

    family='md5' uses a 60-bit md5-derived token hash (conv of the first 15
    hex chars) that DuckDB reproduces exactly (('0x'||substr(md5(t),1,15))
    ::BIGINT) — requires bits <= 60.

    PERF: as a single Column expression this inlines the token-hash array
    into every per-bit aggregate (no CSE inside lambdas → tokens re-hashed
    once per bit, ~3× slower). In a hot path, project token_hashes() into
    its own column first and apply simhash_from_hashes() to it — exactly
    what simhash_near_dup_pairs does.
    """
    if family == "md5" and bits > 60:
        raise ValueError("md5 family exposes 60 hash bits; use bits <= 60")
    return simhash_from_hashes(token_hashes(text, family), bits)


def token_hashes(text: Column, family: str = "xxhash64") -> Column:
    """array<long> of per-token hashes — materialize this behind its own
    projection before feeding simhash_from_hashes: expressions inside
    higher-order lambdas get no common-subexpression elimination, so an
    inlined hash array is re-hashed once PER BIT (measured ~3× slower at
    60 bits; same trap as the shingle split above)."""
    toks = tokens(text)
    if family == "md5":
        return F.transform(
            toks, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
        )
    return F.transform(toks, lambda t: F.xxhash64(t))


def simhash_from_hashes(th: Column, bits: int = 64) -> Column:
    """Pack the per-bit majority votes over pre-computed token hashes."""
    bit_cols = []
    for i in range(bits):
        # sum over tokens of (bit set ? 1 : -1) > 0  → bit i of the simhash
        votes = F.aggregate(
            th,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << i if i < 63 else -(1 << 63))) != 0, 1).otherwise(-1),
        )
        bit_cols.append(
            F.when(votes > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    out = F.lit(0).cast("long")
    for b in bit_cols:
        out = out.bitwiseOR(b)
    return out


def simhash_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    blocks: int = 4,
    family: str = "xxhash64",
) -> DataFrame:
    """Hamming-ball near-dup via the block trick: split the simhash into
    ``blocks`` chunks; any pair within ``max_hamming < blocks`` must agree on
    ≥1 whole chunk → candidates from an equi-join on (block, chunk value),
    verified with bit_count(xor) — never n².
    """
    width = bits // blocks
    mask = (1 << width) - 1
    if family == "md5" and bits > 60:
        raise ValueError("md5 family exposes 60 hash bits; use bits <= 60")
    # hash array materialized in its own projection (see token_hashes)
    sims = df.select(
        F.col(id_col), token_hashes(F.col(text_col), family).alias("__th")
    ).select(id_col, simhash_from_hashes(F.col("__th"), bits).alias("sh"))
    chunks = sims.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("block"),
                        F.shiftright("sh", b * width).bitwiseAND(F.lit(mask)).alias("chunk"),
                    )
                    for b in range(blocks)
                ]
            )
        ).alias("bc"),
    ).select(id_col, "sh", "bc.block", "bc.chunk")
    x, y = chunks.alias("x"), chunks.alias("y")
    ham = F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh")))
    return (
        x.join(
            y,
            (F.col("x.block") == F.col("y.block"))
            & (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --- embedding near-dup -------------------------------------------------------

def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    planes: int = 12,
) -> DataFrame:
    """Cosine near-dup via random-hyperplane LSH: sign-pattern bucket join,
    then exact cosine on candidates (see similarity.py for the primitives)."""
    from shovel_spark.operators.similarity import (
        _probe_dim,
        dot,
        fast_dot,
        hyperplane_signature,
        l2_norm,
    )

    sig = df.select(
        F.col(id_col), F.col(vec_col), hyperplane_signature(F.col(vec_col), planes).alias("sig"),
        # norms hoisted per-vector (same formula/op order as cosine(), so
        # results are bit-identical): the candidate join then runs one
        # dot per pair instead of dot + both norms — unrolled via
        # fast_dot when the corpus dimension is probeable
        l2_norm(F.col(vec_col)).alias("__norm"),
    )
    x, y = sig.alias("x"), sig.alias("y")
    pdim = _probe_dim(df, vec_col)
    pair_dot = (
        fast_dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}"), pdim)
        if pdim
        else dot(F.col(f"x.{vec_col}"), F.col(f"y.{vec_col}"))
    )
    sim = pair_dot / (F.col("x.__norm") * F.col("y.__norm"))
    return (
        x.join(y, (F.col("x.sig") == F.col("y.sig")) & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")))
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --- dup-cluster resolution (connected components) ----------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    iters: int | None = 5,
    max_iters: int = 50,
) -> DataFrame:
    """(node, component) labels over a near-dup pair list — min-label
    propagation (the distributed union-find for dedup clustering: pairs say
    "these two are the same document"; the component's min id is the
    canonical survivor).

    Each iteration: every node takes the min of its own label and its
    neighbors' labels — one equi-join + groupBy per iteration, converges in
    O(component diameter) rounds (near-dup clusters are shallow: a handful
    of rounds covers chains far longer than real boilerplate families).
    A FIXED ``iters`` keeps the trajectory deterministic so an external
    oracle can replay it; ``iters=None`` runs to convergence instead (one
    changed-label count per round, capped at ``max_iters`` — for
    adversarially long chains whose diameter isn't known up front).
    localCheckpoint truncates the per-iteration lineage (no exponential
    plan growth).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        # edges join into EVERY iteration: without this checkpoint the whole
        # upstream pair-generation chain (LSH join + verify) re-executes once
        # per round — at scale that's iters× the candidate-generation cost
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    rounds = iters if iters is not None else max_iters
    for _ in range(rounds):
        nb_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nb"))
        )
        new_labels = (
            labels.join(nb_min, labels.id == nb_min.src, "left")
            .select(
                F.col("id"),
                F.col("label").alias("__old"),
                F.least(F.col("label"), F.coalesce(F.col("nb"), F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        if iters is None:
            # convergence mode: one small count per round (labels only —
            # never data-sized rows), stop when a round changes nothing
            changed = new_labels.filter(F.col("label") != F.col("__old")).limit(1).count()
            labels = new_labels.drop("__old")
            if changed == 0:
                break
        else:
            labels = new_labels.drop("__old")
    return labels.withColumnRenamed("label", "component")


def repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
    min_count: int = 2,
    family: str = "xxhash64",
) -> DataFrame:
    """Exact repeated-passage detection: every ``span_tokens``-token window
    (stride 1) is fingerprinted, and spans occurring ``min_count``+ times
    corpus-wide are reported as (span_hash, n_occurrences, n_docs,
    first_doc) — the hash-fingerprint form of exact substring dedup
    (memorization-prone repeated passages are removed span-wise, not
    doc-wise, because boilerplate repeats inside otherwise-unique pages).

    Scale shape: one token-array projection, one explode to ~one row per
    corpus TOKEN POSITION carrying (8-byte hash, id) — the standard
    hash-fingerprint alternative to a distributed suffix array — then one
    map-side-combined groupBy on the hash. Span text never shuffles. A doc
    shorter than ``span_tokens`` contributes its single whole-text span
    (same clamp convention as shingle_table). NULL ids/text are excluded,
    and so are EMPTY/whitespace-only texts — tokens('') is [''] and two
    such docs would otherwise share a phantom hot span (the hash of the
    empty string).
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    base = (
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col), tokens(F.col(text_col)).alias("__w"))
    )
    n = F.size("__w")
    spans = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (span_tokens - 1), F.lit(1))),
        lambda i: _shingle_key(F.array_join(F.slice("__w", i, span_tokens), " "), family),
    )
    ex = base.select(F.col(id_col), F.explode(spans).alias("span_hash"))
    return (
        ex.groupBy("span_hash")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min(F.col(id_col)).alias("first_doc"),
        )
        .filter(F.col("n_occurrences") >= min_count)
    )


def excise_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
    min_count: int = 2,
    family: str = "xxhash64",
    out_col: str | None = None,
) -> DataFrame:
    """Remove repeated passages span-wise (the excision half of exact
    substring dedup): every ``span_tokens``-token window occurring
    ``min_count``+ times corpus-wide keeps its FIRST occurrence (lowest
    (doc_id, position)) and has every other occurrence's tokens cut from
    the text. Doc-level near-dup removal can't do this — boilerplate
    repeats INSIDE otherwise-unique pages, and repeated passages are what
    models memorize.

    Policy details (all deterministic, partition-invariant):
      - a token survives if it is OUTSIDE every non-first hot-span
        occurrence, or inside ANY first occurrence (first occurrences
        protect their full range, including against overlapping removals);
      - a doc whose every token is excised gets ``''`` (empty string, not
        NULL — NULL still means "no input text");
      - ONLY documents that actually lose tokens are rewritten (surviving
        tokens re-joined single-spaced in original order); untouched
        documents keep their text BYTE-IDENTICAL — the engine-wide text
        invariant — so pre-existing whitespace quirks survive in docs the
        operator didn't cut.

    Scale shape: token positions explode to ~one row per corpus token
    carrying (8-byte hash | 16-byte md5, id, pos) — the same footprint as
    :func:`repeated_spans` plus a position int; first-occurrence election
    is a map-side-combined min-struct groupBy on the span hash; the
    rebuild groupBy runs over CUT documents only (boilerplate-affected
    fraction of the corpus, not all of it). Span text never shuffles.
    """
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    out_col = out_col or text_col
    base = (
        # empty/whitespace-only docs are untouched passthroughs, never span
        # sources: tokens('') is [''] and >= min_count such docs would share
        # a phantom hot span (hash of ''), getting rewritten '  ' -> ''
        df.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__w"))
        .localCheckpoint(eager=False)  # feeds occurrences AND the rebuild
    )
    occ = _span_occurrences(base, span_tokens, family)
    hot = (
        occ.groupBy("h")
        .agg(
            F.count("*").alias("__n"),
            # lexicographic min over (id, pos): the corpus-wide first
            # occurrence, deterministic under any partitioning
            F.min(F.struct(F.col("__id"), F.col("pos"))).alias("first"),
        )
        .filter(F.col("__n") >= min_count)
    )
    tagged = occ.join(hot, "h").select(
        "__id",
        "pos",
        (
            (F.col("__id") == F.col("first.__id")) & (F.col("pos") == F.col("first.pos"))
        ).alias("__keep"),
    )
    span_range = F.explode(
        F.sequence(F.col("pos"), F.col("pos") + (span_tokens - 1))
    ).alias("p")
    removed = tagged.filter(~F.col("__keep")).select("__id", span_range).distinct()
    protected = tagged.filter(F.col("__keep")).select("__id", span_range).distinct()
    cut = removed.join(protected, ["__id", "p"], "left_anti").localCheckpoint(
        eager=False  # feeds the token anti-join AND the touched-doc semi-join
    )
    return _apply_span_cuts(df, base, cut, text_col, id_col, out_col)


def _span_occurrences(base, span_tokens: int, family: str) -> DataFrame:
    """(__id, pos, h) — every ``span_tokens``-token window (stride 1) of
    the tokenized docs, position 1-based, span hashed (text never leaves
    the map stage). Shared by repeated-span excision and span-level
    decontamination."""
    n = F.size("__w")
    return base.select(
        "__id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - (span_tokens - 1), F.lit(1))),
                lambda i: F.struct(
                    i.alias("pos"),
                    _shingle_key(
                        F.array_join(F.slice("__w", i, span_tokens), " "), family
                    ).alias("h"),
                ),
            )
        ).alias("o"),
    ).select("__id", F.col("o.pos").alias("pos"), F.col("o.h").alias("h"))


def _apply_span_cuts(
    df: DataFrame, base, cut, text_col: str, id_col: str, out_col: str
) -> DataFrame:
    """Rebuild docs minus their cut token positions (``cut``: (__id, p),
    1-based). Rebuilds ONLY touched docs — everyone else keeps their
    original string byte-identical and never shuffles tokenized; a
    fully-excised doc gets '' (empty, not NULL)."""
    touched = cut.select("__id").distinct()
    toks = (
        base.join(touched, "__id", "left_semi")
        .select("__id", F.posexplode("__w").alias("p0", "__tok"))
        .withColumn("p", F.col("p0") + 1)
    )
    rebuilt = (
        toks.join(cut, ["__id", "p"], "left_anti")
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "__tok"))),
                    lambda s: s["__tok"],
                ),
                " ",
            ).alias("__new")
        )
    )
    rewrites = touched.join(rebuilt, "__id", "left").select(
        "__id", F.coalesce(F.col("__new"), F.lit("")).alias("__new")
    )
    return (
        df.join(rewrites, df[id_col] == rewrites["__id"], "left")
        .withColumn(
            out_col,
            F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
                F.coalesce(F.col("__new"), F.col(text_col))
            ),
        )
        .drop("__id", "__new")
    )


def excise_contaminated_spans(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 8,
    family: str = "xxhash64",
    out_col: str | None = None,
) -> DataFrame:
    """SPAN-level benchmark decontamination: every ``span_tokens``-token
    corpus window that also appears in the benchmark set is CUT from the
    document (overlapping hits merge), instead of dropping the whole doc —
    the surgical form of :func:`contamination_overlap`'s doc-level filter
    (a 10k-token page shouldn't die for quoting one eval question, but
    the quote itself must not reach training).

    Same byte-identity contract as :func:`excise_repeated_spans`:
    untouched docs keep their text byte-identical; rewritten docs rejoin
    surviving tokens single-spaced; fully-contaminated docs become ''.

    Scale shape: the benchmark side reduces to a DISTINCT hashed-span set
    (eval suites are a few thousand docs — broadcast); the corpus side is
    the same one-row-per-token-position explode as repeated_spans, probed
    with a broadcast semi-join. Corpus text never shuffles; only (hash,
    id, pos) rows move.

    LIMITATION — fixed window length: text shorter than ``span_tokens``
    on EITHER side only matches same-length truncations, so a 6-token
    eval question quoted inside a long page is invisible to
    span_tokens=8 (and a 6-token corpus doc inside a 9-token question
    likewise). Size ``span_tokens`` at or below the shortest benchmark
    item, and keep :func:`contamination_overlap` (k=3 shingles) as the
    doc-level backstop for fragments below that."""
    if span_tokens < 1:
        raise ValueError(f"span_tokens must be >= 1, got {span_tokens}")
    out_col = out_col or text_col
    base = (
        corpus.filter(
            F.col(id_col).isNotNull()
            & F.col(text_col).isNotNull()
            & (F.trim(F.col(text_col)) != "")
        )
        .select(F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__w"))
        .localCheckpoint(eager=False)  # feeds occurrences AND the rebuild
    )
    bench_base = benchmark.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.monotonically_increasing_id().alias("__id"), tokens(F.col(text_col)).alias("__w"))
    bench_spans = _span_occurrences(bench_base, span_tokens, family).select("h").distinct()
    occ = _span_occurrences(base, span_tokens, family)
    hits = occ.join(F.broadcast(bench_spans), "h", "left_semi")
    cut = (
        hits.select(
            "__id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (span_tokens - 1))
            ).alias("p"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    return _apply_span_cuts(corpus, base, cut, text_col, id_col, out_col)


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
    iters: int | None = None,
) -> DataFrame:
    """Keep the BEST row per near-dup cluster (highest ``quality_col``,
    lowest id on ties) — the production canonical-selection policy:
    :func:`dup_clusters` keeps the lowest id, but a real pipeline keeps
    the longest / highest-quality member of each boilerplate family.
    Non-clustered rows pass through untouched.

    Shape: connected components over the pairs (ids only), one broadcast-
    sized join to fetch each clustered id's quality, a per-component
    max_by, then a left-anti join dropping the losers — document text
    never shuffles; only (id, component, quality) rows do."""
    cc = connected_components(pairs, iters=iters)
    q = df.select(F.col(id_col), F.col(quality_col).alias("__q"))
    scored = cc.join(q, cc["id"] == q[id_col]).select("component", "id", "__q")
    # two-stage election, id-type-agnostic (arithmetic negation of the id
    # would crash under ANSI mode for string/UUID ids): max quality per
    # component, then min id among the maximal rows
    mx = scored.groupBy("component").agg(F.max("__q").alias("__mq"))
    best = (
        scored.join(mx, "component")
        .filter(F.col("__q").eqNullSafe(F.col("__mq")))
        .groupBy("component")
        .agg(F.min("id").alias("__keep"))
        .select(F.col("__keep"))
    )
    losers = cc.join(best, cc["id"] == best["__keep"], "left_anti").select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dup_clusters(
    pairs: DataFrame, a_col: str = "id_a", b_col: str = "id_b", iters: int | None = None
) -> DataFrame:
    """Near-dup pairs → (canonical, cluster_size): the keep-one-per-cluster
    resolution step after MinHash/SimHash pair generation (the min id in
    each component is the canonical document to keep).

    Default ``iters=None`` runs label propagation to CONVERGENCE — a
    fixed round count silently under-labels any component whose diameter
    exceeds it. Pass a fixed ``iters`` only when an external oracle must
    replay the exact trajectory (each round is then deterministic)."""
    cc = connected_components(pairs, a_col, b_col, iters)
    return cc.groupBy(F.col("component").alias("canonical")).agg(
        F.count("*").alias("cluster_size")
    )

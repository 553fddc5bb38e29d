"""Dedup + similarity operators vs plain-Python oracles on known corpora."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators import dedup, similarity

BASE = "the quick brown fox jumps over the lazy dog again and again until done"
DOCS = [
    (0, BASE),
    (1, BASE),  # exact dup of 0
    (2, BASE.replace("lazy", "sleepy")),  # near dup of 0
    (3, "completely different content about spark query engines and shuffles here"),
    (4, "the   quick brown fox jumps over the lazy dog again and again until done"),  # ws-normalized dup
    (5, "unrelated short text"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_shingles(text: str, k: int = 3) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


def _py_jaccard(a: str, b: str) -> float:
    sa, sb = _py_shingles(a), _py_shingles(b)
    return len(sa & sb) / len(sa | sb)


def test_exact_dedup_keeps_canonical(docs):
    kept = sorted(r.doc_id for r in dedup.exact_dedup(docs).collect())
    # 1 and 4 are (normalized-)exact dups of 0
    assert kept == [0, 2, 3, 5]


def test_ngram_jaccard_matches_python_oracle(docs):
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    want = {}
    for i, ta in DOCS:
        for j, tb in DOCS:
            if i < j:
                jac = _py_jaccard(ta, tb)
                if jac >= 0.5:
                    want[(i, j)] = jac
    assert set(got) == set(want)
    for pair, jac in want.items():
        assert abs(got[pair] - jac) < 1e-9


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.5, num_hashes=16, bands=8).collect()
    }
    assert (0, 1) in pairs  # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup: 8 bands of 2 is generous
    assert all(3 not in p and 5 not in p for p in pairs)


def test_minhash_jaccard_verified_values(docs):
    rows = dedup.minhash_dedup_pairs(docs, threshold=0.5, num_hashes=16, bands=8).collect()
    for r in rows:
        want = _py_jaccard(DOCS[r.id_a][1], DOCS[r.id_b][1])
        assert abs(r.jaccard - want) < 1e-9


def test_simhash_near_dup(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.simhash_near_dup_pairs(docs, max_hamming=6).collect()}
    assert (0, 1) in pairs  # identical text -> hamming 0
    assert all(p != (0, 3) and p != (0, 5) for p in pairs)
    ham0_2 = [r.hamming for r in dedup.simhash_near_dup_pairs(docs, max_hamming=64).collect() if (r.id_a, r.id_b) == (0, 1)]
    assert ham0_2 == [0]


def _py_cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_cosine_topk_matches_python(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {r.vec_id: list(r.embedding) for r in e.collect()}
    q = rows[0]
    want = sorted(
        ((vid, _py_cosine(v, q)) for vid, v in rows.items() if vid != 0),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = similarity.cosine_topk(e.filter(F.col("vec_id") != 0), q, k=10).collect()
    assert [r.vec_id for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert abs(r.sim - w[1]) < 1e-6


def test_lsh_topk_subset_of_bucket_and_high_recall(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(e.filter(F.col("vec_id") == 0).first().embedding)
    exact = [r.vec_id for r in similarity.cosine_topk(e.filter(F.col("vec_id") != 0), q, k=5).collect()]
    approx = [r.vec_id for r in similarity.lsh_topk(e.filter(F.col("vec_id") != 0), q, k=5, planes=4).collect()]
    # approximate: must return *something* from the right bucket and rank by
    # true cosine within it; with 4 planes recall should be decent
    assert approx
    assert len(set(approx) & set(exact)) >= 1


def test_ivf_topk_with_label_centroids(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.centroids_from_labels(e)
    assert cents.count() == 10
    dims = cents.select(F.size("centroid").alias("d")).distinct().collect()
    assert [r.d for r in dims] == [64]
    q = list(e.filter(F.col("vec_id") == 0).first().embedding)
    got = similarity.ivf_topk(e.filter(F.col("vec_id") != 0), cents, q, k=5, nprobe=3).collect()
    assert len(got) == 5
    exact = [r.vec_id for r in similarity.cosine_topk(e.filter(F.col("vec_id") != 0), q, k=5).collect()]
    assert len({r.vec_id for r in got} & set(exact)) >= 2  # nprobe=3/10 cells


def test_hyperplane_signature_deterministic(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    a = e.select("vec_id", similarity.hyperplane_signature(F.col("embedding")).alias("s")).collect()
    b = e.select("vec_id", similarity.hyperplane_signature(F.col("embedding")).alias("s")).collect()
    assert sorted(a) == sorted(b)


def test_md5_family_matches_xxhash_family_pairs(docs):
    """The hash family is a verification knob, not a semantic change: both
    families must surface the same high-jaccard pairs on the test corpus
    (their candidate sets may differ on borderline pairs; verified pairs at
    threshold 0.5 with 16 hashes should coincide here)."""
    fast = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_dedup_pairs(docs, threshold=0.5, num_hashes=16, bands=8).collect()
    }
    neutral = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_dedup_pairs(
            docs, threshold=0.5, num_hashes=16, bands=8, family="md5"
        ).collect()
    }
    assert (0, 1) in neutral and (0, 4) in neutral  # planted dups always found
    assert fast == neutral


def test_simhash_md5_family_60bit(docs):
    """60-bit md5-family simhash: exact dups at hamming 0, near dups low."""
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_dup_pairs(
            docs, max_hamming=12, bits=60, blocks=4, family="md5"
        ).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0
    # doc 3 is unrelated: no (0,3)/(1,3) pair may pass the hamming gate
    assert all(3 not in p for p in pairs)


def test_ivf_materialized_index_prunes_partitions(spark, tmp_path):
    """build_ivf_index + ivf_topk_indexed: the probe's scan must carry a
    PartitionFilters entry on cell (zero I/O for unprobed cells) and return
    the same rows as the one-shot ivf_topk."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.centroids_from_labels(e)
    q = list(e.filter(F.col("vec_id") == 0).first().embedding)
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(e.filter(F.col("vec_id") != 0), cents, path)

    got = similarity.ivf_topk_indexed(spark, path, cents, q, k=5, nprobe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:200]

    one_shot = similarity.ivf_topk(e.filter(F.col("vec_id") != 0), cents, q, k=5, nprobe=3)
    assert [(r.vec_id, round(r.sim, 6)) for r in got.collect()] == [
        (r.vec_id, round(r.sim, 6)) for r in one_shot.collect()
    ]


def test_kmeans_centroids_deterministic_and_sane(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = similarity.kmeans_centroids(e, k=4, iters=2)
    b = similarity.kmeans_centroids(e, k=4, iters=2)
    ra = sorted((r.cell, tuple(r.centroid)) for r in a.collect())
    rb = sorted((r.cell, tuple(r.centroid)) for r in b.collect())
    assert ra == rb  # deterministic init + rounded trajectory
    assert 1 <= len(ra) <= 4 and all(len(c) == 64 for _, c in ra)
    # objective sanity: mean cosine-to-own-centroid must not decrease vs init
    from pyspark.sql import functions as F

    def mean_sim(cents):
        assigned = similarity.ivf_assign(e, cents)
        return assigned.agg(F.avg("centroid_sim")).first()[0]

    init = e.orderBy("vec_id").limit(4).select(
        F.monotonically_increasing_id().alias("cell"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    assert mean_sim(a) >= mean_sim(init) - 1e-9


def test_connected_components_chain_and_clusters(spark):
    """A 4-node chain (0-1, 1-2, 2-3) must collapse to one component with
    canonical 0; disjoint pair (10, 11) stays its own cluster."""
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    cc = {r.id: r.component for r in dedup.connected_components(pairs, iters=4).collect()}
    assert cc == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10}
    clusters = {
        r.canonical: r.cluster_size for r in dedup.dup_clusters(pairs, iters=4).collect()
    }
    assert clusters == {0: 4, 10: 2}


def test_lsh_materialized_index_prunes_partitions(spark, tmp_path):
    """build_lsh_index + lsh_topk_indexed: the probe's scan must carry a
    PartitionFilters entry on sig_prefix (zero I/O for other buckets) and
    return the same rows as the one-shot lsh_topk (which re-signs the
    corpus per query — the shape this index exists to replace)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(e.filter(F.col("vec_id") == 0).first().embedding)
    corpus = e.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "lsh")
    similarity.build_lsh_index(corpus, path, planes=6)

    got = similarity.lsh_topk_indexed(spark, path, q, k=5, planes=6)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "sig_prefix" in plan.split("PartitionFilters")[1][:200]

    one_shot = similarity.lsh_topk(corpus, q, k=5, planes=6)
    assert [(r.vec_id, round(r.sim, 6)) for r in got.collect()] == [
        (r.vec_id, round(r.sim, 6)) for r in one_shot.collect()
    ]


def test_lsh_index_prefix_partitioning_bounds_dirs(spark, tmp_path):
    """planes > partition_bits: directory count is bounded at
    2^partition_bits and the full-signature row filter still yields exactly
    the one-shot bucket."""
    import os

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(e.filter(F.col("vec_id") == 0).first().embedding)
    corpus = e.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "lsh12")
    similarity.build_lsh_index(corpus, path, planes=12, partition_bits=4)
    dirs = [d for d in os.listdir(os.path.join(path, "table=0")) if d.startswith("sig_prefix=")]
    assert 0 < len(dirs) <= 16
    got = similarity.lsh_topk_indexed(spark, path, q, k=5, planes=12, partition_bits=4)
    one_shot = similarity.lsh_topk(corpus, q, k=5, planes=12)
    assert [(r.vec_id, round(r.sim, 6)) for r in got.collect()] == [
        (r.vec_id, round(r.sim, 6)) for r in one_shot.collect()
    ]


def test_contamination_overlap_flags_leaked_docs(spark):
    """A corpus doc containing a benchmark doc's text verbatim must be
    flagged with overlap >= the benchmark doc's shingle count; an unrelated
    doc must not appear at all."""
    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix words here the quick brown fox jumps over the lazy dog tonight suffix"),
            (11, "completely unrelated content about spark partitions and shuffles everywhere"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.overlap for r in dedup.contamination_overlap(corpus, bench, min_overlap=3).collect()}
    assert 10 in got and got[10] >= 8  # the 10-token leak carries 8 3-shingles
    assert 11 not in got


def test_redact_pii_patterns(spark):
    """Each PII class is replaced by its typed marker; surrounding text is
    untouched; multiple hits in one doc all redact."""
    from shovel_spark.functions.textstats import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and x@y.io now"),
            (2, "call 555-123-4567 or 555.987.6543"),
            (3, "host 192.168.0.1 and 10.0.255.7 up"),
            (4, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.red for r in df.select("doc_id", redact_pii(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail <EMAIL> and <EMAIL> now"
    assert got[2] == "call <PHONE> or <PHONE>"
    assert got[3] == "host <IP> and <IP> up"
    assert got[4] == "no pii here at all"


def test_py_signature_matches_spark_expression(spark):
    """Driver-side query signing must be BIT-IDENTICAL to the Spark
    expression over every test vector, for several plane counts and seeds
    (same planes, same left-fold double accumulation) — the invariant that
    lets probes sign queries with zero Spark jobs."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for planes, seed in [(6, 7), (8, 7), (12, 9)]:
        rows = e.select(
            "vec_id", "embedding",
            similarity.hyperplane_signature(F.col("embedding"), planes, 64, seed).alias("s"),
        ).collect()
        for r in rows:
            assert similarity.py_signature(list(r.embedding), planes, 64, seed) == r.s, r.vec_id


def test_lsh_multi_table_improves_recall(spark, tmp_path):
    """num_tables > 1 (the classic LSH recall knob): the multi-table probe's
    candidate set is the union of per-table buckets, so it must contain
    every single-table result and its top-k cosine-to-exact recall must be
    >= the single-table probe's. Also: no duplicate ids despite an id
    colliding in several tables."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = list(e.filter(F.col("vec_id") == 0).first().embedding)
    corpus = e.filter(F.col("vec_id") != 0)
    exact = {
        r.vec_id
        for r in similarity.cosine_topk(corpus, q, k=10).collect()
    }

    p1, p4 = str(tmp_path / "t1"), str(tmp_path / "t4")
    similarity.build_lsh_index(corpus, p1, planes=8, num_tables=1)
    similarity.build_lsh_index(corpus, p4, planes=8, num_tables=4)
    got1 = similarity.lsh_topk_indexed(spark, p1, q, k=10, planes=8, num_tables=1).collect()
    probe4 = similarity.lsh_topk_indexed(spark, p4, q, k=10, planes=8, num_tables=4)
    # EVERY per-table scan must prune: an OR-shaped filter would silently
    # scan all partitions (partition pruning needs partition-only predicates)
    plan = probe4._jdf.queryExecution().executedPlan().toString()
    pf = [seg[:200] for seg in plan.split("PartitionFilters: [")[1:]]
    assert len(pf) == 4
    assert all("table" in seg and "sig_prefix" in seg for seg in pf)
    got4 = probe4.collect()

    ids4 = [r.vec_id for r in got4]
    assert len(ids4) == len(set(ids4))  # cross-table dedupe
    recall1 = len({r.vec_id for r in got1} & exact)
    recall4 = len(set(ids4) & exact)
    assert recall4 >= recall1
    assert recall4 >= 1  # 4 tables at 8 planes must surface some true neighbor


def test_dup_clusters_default_runs_to_convergence(spark):
    """dup_clusters' DEFAULT must fully label long chains: a 12-node chain
    (diameter 11, beyond any reasonable fixed round count) collapses to one
    cluster of 12 without the caller passing iters."""
    chain = [(i, i + 1) for i in range(11)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    clusters = {r.canonical: r.cluster_size for r in dedup.dup_clusters(pairs).collect()}
    assert clusters == {0: 12}


def test_connected_components_convergence_mode(spark):
    """iters=None runs to convergence: a 9-node chain (diameter 8) fully
    collapses even though the default fixed iters (5) would not reach it."""
    chain = [(i, i + 1) for i in range(8)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    cc = {r.id: r.component for r in dedup.connected_components(pairs, iters=None).collect()}
    assert cc == {i: 0 for i in range(9)}


def test_hash_split_stable_and_partition_invariant(spark):
    """The split of an id must not depend on partitioning, row order, or
    which family's production run it came from; fractions approximately
    honored; xxhash64 and md5 families each internally consistent."""
    from shovel_spark.operators.sampling import hash_split

    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.split for r in hash_split(df).collect()}
    b = {r.doc_id: r.split for r in hash_split(df.repartition(17)).collect()}
    assert a == b  # partition-invariant
    n = len(a)
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / n - 0.9) < 0.02
    assert abs(c["val"] / n - 0.05) < 0.01
    assert abs(c["test"] / n - 0.05) < 0.01
    # md5 family: same stability, engine-replayable assignment
    m1 = {r.doc_id: r.split for r in hash_split(df, family="md5").collect()}
    m2 = {r.doc_id: r.split for r in hash_split(df.repartition(5), family="md5").collect()}
    assert m1 == m2

    import pytest

    with pytest.raises(ValueError):
        hash_split(df, fractions={"train": 0.5, "val": 0.1})


def test_max_doc_freq_noop_parity(docs):
    """When no shingle exceeds the cap, the capped chain must return
    byte-identical pairs to the uncapped chain — the skew defense is free
    until it actually fires."""
    kw = dict(threshold=0.3, num_hashes=16, bands=8)
    uncapped = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.minhash_dedup_pairs(docs, **kw).collect()
    }
    capped = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in dedup.minhash_dedup_pairs(docs, max_doc_freq=100, **kw).collect()
    }
    assert uncapped == capped and uncapped  # non-trivial corpus


def test_max_doc_freq_bounds_hot_shingle_candidates(spark):
    """Synthetic boilerplate corpus: every doc shares a 29-word block, so
    uncapped LSH signatures are dominated by the shared shingles and the
    candidate join goes quadratic. The cap must provably shrink the
    candidate set to ~the planted pairs."""
    boiler = (
        "the quick brown fox jumps over the lazy dog near the riverbank while "
        "morning fog settles quietly across the valley floor and birds begin "
        "their daily chorus of songs"
    )
    n = 60
    rows = [(i, f"{boiler} w{i*7+1} w{i*7+2} w{i*7+3} w{i*7+4} w{i*7+5} w{i*7+6}") for i in range(n)]
    rows += [(i + 100000, f"{boiler} w{i*7+1} w{i*7+2} w{i*7+3} w{i*7+4} w{i*7+5}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def n_candidates(max_doc_freq):
        sh = dedup.shingle_table(df, max_doc_freq=max_doc_freq)
        sigs = dedup.minhash_signatures(sh, num_hashes=16)
        return dedup.lsh_candidate_pairs(sigs, bands=8, num_hashes=16).count()

    uncapped, capped = n_candidates(None), n_candidates(10)
    # uncapped: boilerplate shingles dominate every signature -> bucket
    # collapse toward all-pairs (64 docs -> O(1000s) of candidates)
    assert uncapped > 10 * capped
    assert capped <= 4 * 8  # at most planted pairs x bands, no quadratic blowup
    # and the verified pairs with the cap on are exactly the planted ones
    pairs = dedup.minhash_dedup_pairs(
        df, threshold=0.5, num_hashes=16, bands=8, max_doc_freq=10
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(i, i + 100000) for i in range(4)}


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_lsh_batch_probe_matches_single_probes(spark, emb, tmp_path):
    """lsh_topk_indexed_batch must return, per query row, exactly the rows
    the one-vector probe returns — batched dispatch changes the economics,
    never the answer. Plan: per-query top-k via WindowGroupLimit, and no
    per-query Spark job (single DataFrame)."""
    idx = str(tmp_path / "lsh")
    corpus = emb.filter(F.col("vec_id") >= 20)
    similarity.build_lsh_index(corpus, idx, planes=4, num_tables=2)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = similarity.lsh_topk_indexed_batch(
        spark, idx, queries, k=5, planes=4, num_tables=2
    )
    got = {(r.query_id, r.vec_id): round(r.sim, 9) for r in batch.collect()}
    for q in emb.filter(F.col("vec_id") < 5).collect():
        single = similarity.lsh_topk_indexed(
            spark, idx, [float(x) for x in q.embedding], k=5, planes=4, num_tables=2
        )
        exp = {(q.vec_id, r.vec_id): round(r.sim, 9) for r in single.collect()}
        assert {kk: v for kk, v in got.items() if kk[0] == q.vec_id} == exp
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_ivf_batch_probe_matches_single_probes(spark, emb, tmp_path):
    """ivf_topk_indexed_batch: per-query answers equal the driver-ranked
    single probe; cell ranking happens as a window (no driver collect) and
    the index join gets dynamic partition pruning on `cell`."""
    idx = str(tmp_path / "ivf")
    cents = similarity.centroids_from_labels(emb)
    corpus = emb.filter(F.col("vec_id") >= 20)
    similarity.build_ivf_index(corpus, cents, idx)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    batch = similarity.ivf_topk_indexed_batch(
        spark, idx, cents, queries, k=5, nprobe=3
    )
    got = {(r.query_id, r.vec_id): round(r.sim, 9) for r in batch.collect()}
    for q in emb.filter(F.col("vec_id") < 5).collect():
        single = similarity.ivf_topk_indexed(
            spark, idx, cents, [float(x) for x in q.embedding], k=5, nprobe=3
        )
        exp = {(q.vec_id, r.vec_id): round(r.sim, 9) for r in single.collect()}
        assert {kk: v for kk, v in got.items() if kk[0] == q.vec_id} == exp
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "dynamicpruning" in plan or "DynamicPruning" in plan


def test_incremental_minhash_equals_full_run_restricted(spark, tmp_path):
    """The incremental probe's contract: pairs for a delta batch against a
    standing index == the full-corpus chain restricted to pairs involving
    the delta. Also: update_index makes batch-2 find near-dups of batch-1."""
    corpus = spark.createDataFrame(
        [(i, f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i}") for i in range(20)]
        + [(50, BASE), (51, "completely different content about engines")],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [(100, BASE), (101, BASE.replace("lazy", "sleepy")), (102, "novel text here entirely")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mh")
    kw = dict(k=3, num_hashes=16, bands=8)
    dedup.build_minhash_index(corpus, idx, **kw)
    inc = dedup.incremental_minhash_pairs(spark, idx, delta, threshold=0.3, **kw)
    got = {(r.id_a, r.id_b): round(r.jaccard, 9) for r in inc.collect()}
    full = dedup.minhash_dedup_pairs(corpus.unionByName(delta), threshold=0.3, **kw)
    exp = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in full.collect()
        if r.id_a >= 100 or r.id_b >= 100
    }
    assert got == exp
    assert (50, 100) in got  # cross-batch exact dup found
    assert (100, 101) in got  # within-delta near dup found

    # append batch 1, probe batch 2: its dup of doc 100 must surface
    dedup.incremental_minhash_pairs(
        spark, idx, delta, threshold=0.3, update_index=True, **kw
    ).count()
    delta2 = spark.createDataFrame([(200, BASE)], "doc_id long, text string")
    inc2 = dedup.incremental_minhash_pairs(spark, idx, delta2, threshold=0.3, **kw)
    got2 = {(r.id_a, r.id_b) for r in inc2.collect()}
    assert (100, 200) in got2 and (50, 200) in got2


def test_repeated_spans_finds_shared_passages(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x y a b c d q"),   # shares the 4-token span "a b c d"
            (3, "solo"),            # short doc -> single whole-text span
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = dedup.repeated_spans(df, span_tokens=4, min_count=2).collect()
    assert sorted((r.n_occurrences, r.n_docs, r.first_doc) for r in out) == [
        (2, 2, 1),  # "a b c d" in docs 1 and 2
        (2, 2, 3),  # "solo" whole-text span in docs 3 and 4
    ]
    # self-repetition inside ONE doc still counts occurrences
    rep = spark.createDataFrame([(9, "p q p q p q p q")], "doc_id long, text string")
    r = dedup.repeated_spans(rep, span_tokens=2, min_count=3).collect()
    assert any(row.n_docs == 1 and row.n_occurrences >= 3 for row in r)


def test_resolve_duplicates_keeps_best_quality(spark):
    df = spark.createDataFrame(
        [(1, 0.4), (2, 0.9), (3, 0.9), (7, 0.2), (8, 0.95), (9, 0.1)],
        "doc_id long, q double",
    )
    # clusters {1,2,3} (chain) and {7,8}; 9 untouched
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in dedup.resolve_duplicates(df, pairs, "q").collect())
    # {1,2,3}: q ties at 0.9 -> lowest id 2; {7,8}: 8 wins on quality
    assert kept == [2, 8, 9]


def _py_excise(docs, k, min_count):
    """Reference implementation of excise_repeated_spans' policy."""
    occ = {}  # h -> [(doc, pos)]
    toks = {d: t.split() for d, t in docs.items() if t is not None}
    for d in sorted(toks):
        w = toks[d]
        for i in range(max(len(w) - k + 1, 1)):
            h = " ".join(w[i : i + k])
            occ.setdefault(h, []).append((d, i))
    cut = {d: set() for d in toks}
    protect = {d: set() for d in toks}
    for h, occs in occ.items():
        if len(occs) < min_count:
            continue
        first = min(occs)
        for (d, i) in occs:
            rng = range(i, i + k)
            (protect if (d, i) == first else cut)[d].update(rng)
    out = {}
    for d, w in toks.items():
        keep = [t for p, t in enumerate(w) if p not in (cut[d] - protect[d])]
        out[d] = " ".join(keep)
    for d, t in docs.items():
        if t is None:
            out[d] = None
    return out


def test_excise_repeated_spans_matches_python_oracle(spark):
    docs = {
        1: "intro words here SPAM SPAM SPAM SPAM closing remarks",
        2: "other doc start SPAM SPAM SPAM SPAM more content after",
        3: "clean document without the repeated block at all",
        4: None,
        5: "SPAM SPAM SPAM SPAM SPAM SPAM",  # overlapping occurrences
        6: "edge SPAM SPAM SPAM SPAM",       # occurrence at doc end
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in dedup.excise_repeated_spans(df, span_tokens=4, min_count=2).collect()
    }
    assert got == _py_excise(docs, 4, 2)
    # partition invariance
    got7 = {
        r.doc_id: r.text
        for r in dedup.excise_repeated_spans(
            df.repartition(7), span_tokens=4, min_count=2
        ).collect()
    }
    assert got7 == got


def test_excise_preserves_untouched_docs_byte_identical(spark):
    """Docs the operator does not cut must come back BYTE-identical (the
    engine-wide text invariant) — including odd whitespace the tokenizer
    would normalize; a fully-excised doc yields '' and NULL stays NULL."""
    docs = {
        1: "SPAM SPAM SPAM",            # hot span, first occurrence kept
        2: "SPAM SPAM SPAM",            # fully excised -> ''
        3: "untouched   doc  with   weird    spacing",
        4: None,
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        r.doc_id: r.text
        for r in dedup.excise_repeated_spans(df, span_tokens=3, min_count=2).collect()
    }
    assert got[1] == "SPAM SPAM SPAM"
    assert got[2] == ""
    assert got[3] == "untouched   doc  with   weird    spacing"  # byte-identical
    assert got[4] is None


def test_empty_docs_produce_no_phantom_spans(spark):
    """tokens('') is [''] — empty/whitespace-only docs must neither share a
    phantom hot span in repeated_spans nor get rewritten by excision."""
    df = spark.createDataFrame(
        [(1, ""), (2, "  "), (3, ""), (4, "real content in this row")],
        "doc_id long, text string",
    )
    assert dedup.repeated_spans(df, span_tokens=2, min_count=2).count() == 0
    got = {
        r.doc_id: r.text
        for r in dedup.excise_repeated_spans(df, span_tokens=2, min_count=2).collect()
    }
    assert got == {1: "", 2: "  ", 3: "", 4: "real content in this row"}


def test_resolve_duplicates_string_ids(spark):
    """resolve_duplicates must work with non-numeric id columns (URL/UUID
    doc ids), like every other generic-id dedup API in the module."""
    df = spark.createDataFrame(
        [("u-a", 0.4), ("u-b", 0.9), ("u-c", 0.9), ("u-z", 0.1)],
        "doc_id string, q double",
    )
    pairs = spark.createDataFrame(
        [("u-a", "u-b"), ("u-b", "u-c")], "id_a string, id_b string"
    )
    kept = sorted(r.doc_id for r in dedup.resolve_duplicates(df, pairs, "q").collect())
    assert kept == ["u-b", "u-z"]  # q ties at 0.9 -> lowest id u-b; u-z untouched


def test_capped_index_build_and_incremental_consistency(spark, tmp_path):
    """max_doc_freq threaded through the standing-index path (ADVICE r4):
    the build drops corpus-hot shingles before signatures AND before
    storing keys, records the cap in meta/ and the dropped shingles' doc
    frequencies in hot_df/; incremental probes default to the build-time
    cap and compute EXACT corpus+delta totals — covering both
    already-hot-at-build and newly-hot-with-the-delta shingles."""
    boiler = "subscribe to our newsletter for updates every day"
    kw = dict(k=3, num_hashes=16, bands=8)
    # 6 corpus docs share the boilerplate (df=6 > cap=4); unique tails
    corpus = spark.createDataFrame(
        [(i, f"{boiler} unique{i} tail{i} words{i} here{i}") for i in range(6)]
        + [(50, BASE)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhcap")
    dedup.build_minhash_index(corpus, idx, max_doc_freq=4, **kw)

    # meta records the cap; hot_df stores the dropped shingles' exact df
    assert dedup._read_index_cap(spark, idx) == 4
    hot = spark.read.parquet(f"{idx}/hot_df")
    assert hot.count() > 0
    assert hot.agg(F.max("df")).first()[0] == 6
    # stored shingle keys exclude the boilerplate shingles: no stored key
    # may have df > cap
    stored_df = (
        spark.read.parquet(f"{idx}/shingles").groupBy("shk").count()
    )
    assert stored_df.agg(F.max("count")).first()[0] <= 4

    # a delta doc that is ONLY boilerplate + its own tail must not pair
    # with the corpus (the shared shingles are capped); default
    # max_doc_freq="index" picks the cap up from meta
    delta = spark.createDataFrame(
        [(100, f"{boiler} fresh900 tail900 words900 here900")],
        "doc_id long, text string",
    )
    inc = dedup.incremental_minhash_pairs(spark, idx, delta, threshold=0.3, **kw)
    assert inc.count() == 0

    # parity with the full capped chain restricted to delta pairs
    full = dedup.minhash_dedup_pairs(
        corpus.unionByName(delta), threshold=0.3, max_doc_freq=4, **kw
    )
    assert {(r.id_a, r.id_b) for r in full.collect() if r.id_a >= 100 or r.id_b >= 100} == set()

    # an explicit override disables the cap: now the boilerplate pairs the
    # delta doc with corpus docs (proves the default was doing the capping)
    uncapped = dedup.incremental_minhash_pairs(
        spark, idx, delta, threshold=0.3, max_doc_freq=None, **kw
    )
    # index rows for capped shingles don't exist, so even uncapped probes
    # can't resurrect them — candidates come only from stored buckets
    assert uncapped.count() == 0


def test_capped_incremental_newly_hot_shingle(spark, tmp_path):
    """A shingle UNDER the cap at build time that crosses it with the
    delta must be excluded from the delta's signatures and verification
    sets (totals = index rows + delta rows), so delta-borne boilerplate
    can't create quadratic buckets or false pairs."""
    boiler = "click here to read the full story now friends"
    kw = dict(k=3, num_hashes=16, bands=8)
    corpus = spark.createDataFrame(
        [(1, f"{boiler} corpusone tail alpha beta gamma"),
         (2, "totally unrelated content about mountain weather patterns today")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhhot")
    dedup.build_minhash_index(corpus, idx, max_doc_freq=3, **kw)  # df(boiler)=1 ≤ 3: stored
    delta = spark.createDataFrame(
        [(100 + i, f"{boiler} deltadoc{i} tail{i} x{i} y{i}") for i in range(4)],
        "doc_id long, text string",
    )
    # totals for boiler shingles = 1 (index) + 4 (delta) = 5 > 3 → capped now
    inc = dedup.incremental_minhash_pairs(spark, idx, delta, threshold=0.3, **kw)
    assert inc.count() == 0
    # same corpus+delta through the full capped chain agrees
    full = dedup.minhash_dedup_pairs(
        corpus.unionByName(delta), threshold=0.3, max_doc_freq=3, **kw
    )
    assert full.count() == 0
    # update_index appends the newly-hot totals so the NEXT delta still
    # sees the shingle as hot even though no side stores its rows
    dedup.incremental_minhash_pairs(
        spark, idx, delta, threshold=0.3, update_index=True, **kw
    ).count()
    hot = dedup._read_hot_df(spark, idx, "xxhash64")
    assert hot.agg(F.max("__hdf")).first()[0] == 5
    delta2 = spark.createDataFrame(
        [(300, f"{boiler} final300 tail300 x300 y300")], "doc_id long, text string"
    )
    inc2 = dedup.incremental_minhash_pairs(spark, idx, delta2, threshold=0.3, **kw)
    assert inc2.count() == 0


def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    """SemDeDup policy: within a dup component keep the member farthest
    from its cluster centroid (min rounded centroid_sim, ties -> min id);
    singletons keep; pairs only form within a cell."""
    rows = (
        # cluster A around e1: 5 distinct members + a scaled copy of vec 0
        [(i, [1.0, 0.3 * i, 0.0, 0.0]) for i in range(5)]
        + [(1000, [2.0, 0.0, 0.0, 0.0])]          # copy of vec 0 (cosine 1)
        # cluster B around e3: far from A, all mutually distinct
        + [(100 + i, [0.0, 0.0, 1.0, 0.4 * i]) for i in range(4)]
    )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in similarity.semantic_dedup(
        df, k=2, iters=2, threshold=0.9999, cc_iters=3
    ).collect()}
    assert len(out) == 10
    # vec 0 and its scaled copy share a component; centroid sims tie after
    # rounding, so the LOWER id keeps
    assert out[0].component == out[1000].component
    assert out[0].keep and not out[1000].keep
    # distinct members are singletons and keep
    for vid in (1, 2, 3, 4, 100, 101, 102, 103):
        assert out[vid].component == vid and out[vid].keep, vid
    # the two planted clusters land in different cells; A-B cross pairs
    # never form (vec 100's copy would have paired otherwise)
    assert {out[i].cell for i in range(5)} != {out[100 + i].cell for i in range(4)}


def test_semantic_dedup_partition_invariant(spark):
    """Decisions are deterministic in the data, not the partitioning."""
    rows = [(i, [float((i * 7) % 5 + 1), float((i * 3) % 4), 1.0, 0.5]) for i in range(40)]
    rows += [(500 + i, [x * 3.0 for x in rows[i][1]]) for i in range(6)]  # copies
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {(r.vec_id, r.cell, r.component, r.keep)
         for r in similarity.semantic_dedup(df, k=3, threshold=0.9999).collect()}
    b = {(r.vec_id, r.cell, r.component, r.keep)
         for r in similarity.semantic_dedup(df.repartition(13), k=3, threshold=0.9999).collect()}
    assert a == b
    kept = {v for v, _, _, k in a if k}
    assert all(500 + i not in kept for i in range(6))  # every copy dropped


def test_capped_incremental_prior_delta_hot_shingle_parity(spark, tmp_path):
    """Regression (round-5 review): a shingle capped by a PREVIOUS delta
    (update_index recorded its total in hot_df) keeps build-era rows in
    shingles/ — a LATER delta's verification must exclude them even when
    that delta also contains the shingle's docs, or set sizes inflate and
    jaccard drifts from the full capped re-run."""
    B = "click here now please thanks"
    kw = dict(k=3, num_hashes=16, bands=16, family="xxhash64")
    corpus = spark.createDataFrame(
        [(1, f"{B} alpha beta gamma delta epsilon"),
         (2, f"{B} zeta eta theta iota kappa"),
         (3, f"{B} lam mu nu xi omicron")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhprior")
    dedup.build_minhash_index(corpus, idx, max_doc_freq=3, **kw)  # df(B)=3 <= 3: stored
    d1 = spark.createDataFrame(
        [(10, f"{B} pi rho sigma tau upsilon")], "doc_id long, text string"
    )
    # B crosses the cap (3+1 > 3); update_index records its total in hot_df
    dedup.incremental_minhash_pairs(
        spark, idx, d1, threshold=0.9, update_index=True, **kw
    ).count()
    assert dedup._read_hot_df(spark, idx, "xxhash64").count() > 0

    # delta 2: an exact copy of doc 2's text — candidacy survives the
    # signature drift (bands == num_hashes: one agreeing hash suffices)
    d2 = spark.createDataFrame(
        [(20, f"{B} zeta eta theta iota kappa")], "doc_id long, text string"
    )
    inc = {(r.id_a, r.id_b): round(r.jaccard, 9)
           for r in dedup.incremental_minhash_pairs(spark, idx, d2, threshold=0.05, **kw).collect()}
    assert (2, 20) in inc
    full = {(r.id_a, r.id_b): round(r.jaccard, 9)
            for r in dedup.minhash_dedup_pairs(
                corpus.unionByName(d1).unionByName(d2),
                threshold=0.05, max_doc_freq=3, **kw
            ).collect()}
    # the found pair's jaccard must equal the full capped re-run's value
    assert inc[(2, 20)] == full[(2, 20)] == 1.0


def test_uncapped_rebuild_clears_stale_hot_df(spark, tmp_path):
    """An uncapped rebuild over a previously capped index must clear
    hot_df — stale totals would wrongly push live shingles over the cap
    in a later explicitly-capped probe."""
    kw = dict(k=3, num_hashes=16, bands=8, family="xxhash64")
    boiler = "the very same sentence repeated in every single document here"
    c1 = spark.createDataFrame(
        [(i, f"{boiler} unique{i} tail{i} words{i}") for i in range(5)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhstale")
    dedup.build_minhash_index(c1, idx, max_doc_freq=3, **kw)
    assert dedup._read_hot_df(spark, idx, "xxhash64").count() > 0
    # uncapped rebuild over a different corpus: hot_df must read empty
    c2 = spark.createDataFrame(
        [(1, "completely fresh corpus about mountains and rivers flowing")],
        "doc_id long, text string",
    )
    dedup.build_minhash_index(c2, idx, **kw)
    assert dedup._read_hot_df(spark, idx, "xxhash64").count() == 0
    assert dedup._read_index_cap(spark, idx) is None


def test_hot_df_totals_replay_idempotent(spark, tmp_path):
    """Regression (round-5 review): replaying update_index for the same
    delta must not inflate the stored hot_df totals (only newly-hot keys
    append; stored keys keep their crossing-time total)."""
    B = "breaking news read all about it today"
    kw = dict(k=3, num_hashes=16, bands=8, family="xxhash64")
    corpus = spark.createDataFrame(
        [(i, f"{B} unique{i} tail{i} words{i}") for i in range(3)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhreplay")
    dedup.build_minhash_index(corpus, idx, max_doc_freq=3, **kw)
    d1 = spark.createDataFrame(
        [(10, f"{B} fresh10 tail10 words10")], "doc_id long, text string"
    )
    for _ in range(3):  # at-least-once replays
        dedup.incremental_minhash_pairs(
            spark, idx, d1, threshold=0.9, update_index=True, **kw
        ).count()
    hot = dedup._read_hot_df(spark, idx, "xxhash64")
    # totals stay at the crossing-time value (3 corpus + 1 delta), not 4+1k
    assert hot.agg(F.max("__hdf")).first()[0] == 4


def test_excise_contaminated_spans_policy(spark):
    """Span-level decontamination: benchmark-overlapping windows are cut
    (overlaps merged), untouched docs stay byte-identical (weird
    whitespace preserved), fully-contaminated docs become ''. Partition-
    invariant."""
    corpus = spark.createDataFrame(
        [
            (1, "intro words here what is the capital of france answer below maybe"),
            (2, "clean  document   with odd spacing kept byte identical"),
            (3, "what is the capital of france"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text for r in dedup.excise_contaminated_spans(
        corpus, bench, span_tokens=6
    ).collect()}
    assert out[1] == "intro words here answer below maybe"
    assert out[2] == "clean  document   with odd spacing kept byte identical"
    assert out[3] == ""
    assert out[4] is None
    out2 = {r.doc_id: r.text for r in dedup.excise_contaminated_spans(
        corpus.repartition(7), bench, span_tokens=6
    ).collect()}
    assert out2 == out


def test_paragraph_dedup_policy_and_reassembly(spark):
    """Global first-occurrence keeps a shared paragraph in ONE doc; later
    docs (and later repeats WITHIN a doc) lose it; surviving paragraphs
    rejoin in original order; fully-deduped docs come back as ''."""
    from shovel_spark.operators.dedup import paragraph_dedup

    p1 = "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10"   # one 10-word para
    tail1 = "t1 t2"
    tail2 = "u1 u2 u3"
    rows = [
        (1, f"{p1} {tail1}"),            # first occurrence of p1 + own tail
        (2, f"{p1} {tail2}"),            # loses p1, keeps tail
        (3, f"{p1} {p1}"),               # within-doc repeat: all dropped
        (4, tail2),                      # dup of doc2's tail para -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in paragraph_dedup(df).collect()}
    assert (got[1].n_paras, got[1].n_kept, got[1].text) == (2, 2, f"{p1} {tail1}")
    assert (got[2].n_paras, got[2].n_kept, got[2].text) == (2, 1, tail2)
    assert (got[3].n_paras, got[3].n_kept, got[3].text) == (2, 0, "")
    assert (got[4].n_paras, got[4].n_kept, got[4].text) == (1, 0, "")


def test_margin_mine_mutual_best_and_hub_suppression(spark):
    """margin_mine keeps only MUTUAL-best pairs above threshold, and the
    neighborhood normalization suppresses a hub vector (close to
    everything) that raw cosine alone would match to every query.

    Geometry: a0/b0 and a1/b1 are genuine pairs (near-identical
    directions); bH is a hub sitting between them (high cosine to both
    a0 and a1) — after dividing by its dense neighborhood average its
    margin stays ~1, so neither a keeps it; a2 points nowhere near any
    b, so it mines nothing."""
    from shovel_spark.operators.similarity import margin_mine

    a_rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    b_rows = [
        (1, [0.99, 0.05, 0.0, 0.0]),
        (3, [0.05, 0.99, 0.0, 0.0]),
        (5, [0.6, 0.6, 0.1, 0.0]),  # hub: fairly close to BOTH a0 and a2
    ]
    a = spark.createDataFrame(a_rows, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(b_rows, "vec_id long, embedding array<double>")
    got = {
        (r.a_id, r.b_id): r.margin
        for r in margin_mine(a, b, k=2, threshold=1.05).collect()
    }
    assert set(got) == {(0, 1), (2, 3)}
    assert all(m > 1.05 for m in got.values())
    # candidates fence: a single-pair fence makes BOTH neighborhood
    # averages equal the pair's own cosine, so margin == 1.0 exactly —
    # a strict threshold just below keeps it
    cand = spark.createDataFrame([(0, 1)], "a_id long, b_id long")
    fenced = margin_mine(a, b, k=2, threshold=0.999, candidates=cand).collect()
    assert [(r.a_id, r.b_id, r.margin) for r in fenced] == [(0, 1, 1.0)]


def test_bloom_decontaminate_two_tier(spark):
    """Tier 1 (Bloom shortlist) can never miss a contaminated doc — no
    false negatives — and tier 2's exact counts agree with the direct
    broadcast path (contamination_overlap) on every verdict; candidate
    counts bound exact counts from above (false positives absorbed)."""
    from shovel_spark.operators.dedup import (
        bloom_decontaminate,
        contamination_overlap,
    )

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "completely unrelated words about spark partitions here"),
            (11, "prefix text then the quick brown fox jumps over the lazy dog tonight"),
            (12, "quick brown fox appears but nothing else matches at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in bloom_decontaminate(
            corpus, bench, m_bits=4096, min_overlap=3
        ).collect()
    }
    exact = {
        r.doc_id: r.overlap
        for r in contamination_overlap(corpus, bench, min_overlap=1).collect()
    }
    # every doc with ANY true overlap must be shortlisted (no false negatives)
    assert set(exact) <= set(got)
    for doc_id, row in got.items():
        assert row.exact_shingles == exact.get(doc_id, 0)
        assert row.candidate_shingles >= row.exact_shingles
        assert row.contaminated == (row.exact_shingles >= 3)
    assert got[11].contaminated and not got.get(12, got[11]).contaminated


def test_bloom_decontaminate_tiny_filter_absorbs_false_positives(spark):
    """A deliberately saturated 64-bit filter floods tier 1 with false
    positives; tier 2 still reports exact_shingles == the true overlap
    (0 for the clean doc) — the correctness story does not depend on
    the filter's size, only the cost does."""
    from shovel_spark.operators.dedup import bloom_decontaminate

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(10, "totally different tokens one two three four five six")],
        "doc_id long, text string",
    )
    rows = bloom_decontaminate(
        corpus, bench, m_bits=64, bloom_k=2, min_overlap=1
    ).collect()
    for r in rows:
        assert r.exact_shingles == 0 and not r.contaminated

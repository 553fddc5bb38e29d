from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.sampling import pack_shards, quota_sample


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 5}", 10 + (i * 37) % 90) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tok long")


# --- quota_sample ---------------------------------------------------------


def test_quota_caps_every_key(spark, docs):
    out = quota_sample(docs, "source", 7).groupBy("source").count().collect()
    assert len(out) == 5
    assert all(r["count"] == 7 for r in out)


def test_quota_keeps_small_keys_whole(spark, docs):
    out = quota_sample(docs, "source", 1000)
    assert out.count() == 200


def test_quota_monotone_nesting(spark, docs):
    small = {r["doc_id"] for r in quota_sample(docs, "source", 3).collect()}
    big = {r["doc_id"] for r in quota_sample(docs, "source", 5).collect()}
    assert small < big


def test_quota_deterministic_across_partitioning(spark, docs):
    a = {r["doc_id"] for r in quota_sample(docs, "source", 4).collect()}
    b = {r["doc_id"] for r in quota_sample(docs.repartition(13), "source", 4).collect()}
    assert a == b


def test_quota_md5_family_and_null_ids(spark):
    rows = [(None, "a"), (1, "a"), (2, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = quota_sample(df, "source", 2, family="md5").collect()
    ids = {r["doc_id"] for r in out}
    assert None not in ids and 3 in ids and len(ids) == 3


def test_quota_window_group_limit_in_plan(spark, docs):
    """row_number() <= k must compile to WindowGroupLimit (per-partition
    top-k before the shuffle) — the property that makes a hot domain safe."""
    plan = (
        quota_sample(docs, "source", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


# --- pack_shards ----------------------------------------------------------


def test_pack_assigns_every_row_once(spark, docs):
    out = pack_shards(docs, "n_tok", budget=500, num_buckets=4)
    assert out.count() == 200
    assert out.select("doc_id").distinct().count() == 200


def test_pack_shard_totals_bounded(spark, docs):
    out = pack_shards(docs, "n_tok", budget=500, num_buckets=4)
    per_shard = out.groupBy("shard_bucket", "shard_seq").agg(
        F.sum("n_tok").alias("tok")
    )
    max_doc = 99  # largest n_tok in the fixture
    rows = per_shard.collect()
    # every shard except possibly the last of its bucket reaches the budget
    last = {
        r["shard_bucket"]: r["max_seq"]
        for r in per_shard.groupBy("shard_bucket").agg(F.max("shard_seq").alias("max_seq")).collect()
    }
    for r in rows:
        assert r["tok"] < 500 + max_doc
        if r["shard_seq"] < last[r["shard_bucket"]]:
            assert r["tok"] >= 500 - max_doc


def test_pack_seq_contiguous_from_zero(spark, docs):
    out = pack_shards(docs, "n_tok", budget=300, num_buckets=4)
    for b in out.select("shard_bucket").distinct().collect():
        seqs = sorted(
            r["shard_seq"]
            for r in out.filter(F.col("shard_bucket") == b[0])
            .select("shard_seq")
            .distinct()
            .collect()
        )
        assert seqs == list(range(len(seqs)))


def test_pack_deterministic_across_partitioning(spark, docs):
    a = {(r["doc_id"], r["shard_id"]) for r in pack_shards(docs, "n_tok", 400).collect()}
    b = {
        (r["doc_id"], r["shard_id"])
        for r in pack_shards(docs.repartition(11), "n_tok", 400).collect()
    }
    assert a == b


def test_pack_validates_args(spark, docs):
    with pytest.raises(ValueError):
        pack_shards(docs, "n_tok", budget=0)
    with pytest.raises(ValueError):
        pack_shards(docs, "n_tok", budget=10, num_buckets=0)


def test_pack_seq_dense_with_oversized_docs(spark):
    """A doc bigger than the budget consumes several budget slots but must
    NOT leave gaps in shard_seq (dense renumber)."""
    rows = [(1, 5000), (2, 10), (3, 10), (4, 5000), (5, 10)]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_shards(df, "n_tok", budget=2000, num_buckets=1)
    seqs = sorted(r["shard_seq"] for r in out.select("shard_seq").distinct().collect())
    assert seqs == list(range(len(seqs)))


def test_pack_bucket_uses_full_hash(spark):
    """num_buckets beyond the old mod-10000 space must still populate more
    than 10000 distinct buckets' worth of id space uniformly-ish."""
    df = spark.range(5000).select(F.col("id").alias("doc_id"), F.lit(1).alias("n_tok"))
    out = pack_shards(df, "n_tok", budget=10, num_buckets=40_000)
    n_buckets = out.select("shard_bucket").distinct().count()
    assert n_buckets > 4000  # ~4400 expected from 5000 balls in 40000 bins
    assert out.agg(F.max("shard_bucket")).first()[0] > 10_000


# --- stratified_hash_sample / temperature_fractions -----------------------


def test_temperature_flattens_head(spark):
    from shovel_spark.operators.sampling import temperature_fractions

    fr = temperature_fractions({"head": 10000, "tail": 100}, target_total=2000)
    # α=0.5: tail keeps a larger share of itself than head
    assert fr["tail"] > fr["head"]
    assert 0.0 < fr["head"] <= 1.0 and 0.0 < fr["tail"] <= 1.0


def test_temperature_cap_and_edge_cases(spark):
    from shovel_spark.operators.sampling import temperature_fractions

    assert temperature_fractions({"a": 10}, target_total=1000) == {"a": 1.0}
    assert temperature_fractions({}, target_total=10) == {}
    assert temperature_fractions({"a": 5}, target_total=0) == {"a": 0.0}
    with pytest.raises(ValueError):
        temperature_fractions({"a": 5}, target_total=-1)


def test_stratified_sample_membership_nested_and_deterministic(spark, docs):
    from shovel_spark.operators.sampling import stratified_hash_sample

    small = stratified_hash_sample(docs, "source", {"src0": 0.2, "src1": 0.5})
    big = stratified_hash_sample(docs, "source", {"src0": 0.6, "src1": 0.9})
    s_ids = {r["doc_id"] for r in small.collect()}
    b_ids = {r["doc_id"] for r in big.collect()}
    assert s_ids <= b_ids
    # unlisted keys dropped by default (default_fraction=0)
    assert {r["source"] for r in big.collect()} == {"src0", "src1"}
    again = {r["doc_id"] for r in stratified_hash_sample(docs.repartition(9), "source", {"src0": 0.2, "src1": 0.5}).collect()}
    assert again == s_ids


def test_stratified_default_fraction_keeps_unlisted(spark, docs):
    from shovel_spark.operators.sampling import stratified_hash_sample

    out = stratified_hash_sample(docs, "source", {"src0": 0.0}, default_fraction=1.0)
    got = {r["source"] for r in out.collect()}
    assert "src0" not in got and len(got) == 4


def test_stratified_validates_fraction(spark, docs):
    from shovel_spark.operators.sampling import stratified_hash_sample

    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "source", {"src0": 1.5})


def test_temperature_zero_count_key(spark):
    from shovel_spark.operators.sampling import temperature_fractions

    fr = temperature_fractions({"a": 0, "b": 100}, target_total=50)
    assert fr["a"] == 0.0 and 0.0 < fr["b"] <= 1.0


def test_stratified_validates_default_fraction(spark, docs):
    from shovel_spark.operators.sampling import stratified_hash_sample

    with pytest.raises(ValueError):
        stratified_hash_sample(docs, "source", {"src0": 0.5}, default_fraction=1.5)


def test_stratified_matches_hash_sample_at_same_fraction(spark, docs):
    """Same quantization rule everywhere: a one-key stratified sample and a
    plain hash_sample at the same (half-bucket) fraction agree exactly."""
    from shovel_spark.operators.sampling import hash_sample, stratified_hash_sample

    frac = 0.12345  # quantizes to a half bucket: floor/round would disagree
    a = {r["doc_id"] for r in hash_sample(docs, frac).collect()}
    b = {
        r["doc_id"]
        for r in stratified_hash_sample(
            docs, "source", {f"src{i}": frac for i in range(5)}
        ).collect()
    }
    assert a == b


def test_write_jsonl_shards_roundtrip(spark, tmp_path):
    """Shard export: every row lands in exactly one shard_id dir as JSONL,
    per-shard token totals respect the budget envelope, and re-running is
    deterministic (same rows in the same shards)."""
    import glob
    import gzip
    import json

    from shovel_spark.io.sinks import write_jsonl_shards

    rows = [(i, f"doc {i}", 100 + (i % 7) * 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_tokens int")
    out = str(tmp_path / "shards")
    write_jsonl_shards(df, out, "n_tokens", budget=1000, num_buckets=4)

    def read_all():
        got = {}
        for d in glob.glob(out + "/shard_id=*"):
            sid = int(d.rsplit("=", 1)[1])
            for f in glob.glob(d + "/*"):
                for line in gzip.open(f, "rt"):
                    r = json.loads(line)
                    got[r["doc_id"]] = (sid, r["n_tokens"])
        return got

    got = read_all()
    assert len(got) == 200  # every row exactly once
    per_shard = {}
    for sid, tks in got.values():
        per_shard[sid] = per_shard.get(sid, 0) + tks
    max_doc = max(t for _, t in got.values())
    assert all(tot < 1000 + max_doc for tot in per_shard.values())

    write_jsonl_shards(df, out, "n_tokens", budget=1000, num_buckets=4)
    assert read_all() == got  # deterministic re-run


def test_weighted_sample_k_properties(spark):
    """A-ES weighted sampling: deterministic, partition-invariant,
    weight-monotone (10x weight ~10x inclusion odds over many seeds),
    zero/NULL weights never selected, grouped variant caps per group."""
    from pyspark.sql import functions as F

    from shovel_spark.operators.sampling import weighted_sample_k

    rows = [(i, 100.0 if i < 10 else 1.0) for i in range(210)]
    rows += [(500, 0.0), (501, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    a = {r.doc_id for r in weighted_sample_k(df, 30, "w").collect()}
    b = {r.doc_id for r in weighted_sample_k(df.repartition(17), 30, "w").collect()}
    assert a == b and len(a) == 30
    assert 500 not in a and 501 not in a

    # heavy keys (w=100, 10 of them vs 200 light) should dominate across
    # seeds: expected heavy inclusion >> their 1/21 population share
    heavy_hits = 0
    for seed in range(8):
        got = {r.doc_id for r in weighted_sample_k(df, 30, "w", seed=seed).collect()}
        heavy_hits += sum(1 for d in got if d < 10)
    assert heavy_hits >= 8 * 6  # >= 6 of 10 heavy rows per draw on average

    # grouped: k per group
    g = df.withColumn("grp", (F.col("doc_id") % 3).cast("int"))
    out = weighted_sample_k(g, 5, "w", group_cols=["grp"])
    per = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert all(v == 5 for v in per.values()) and len(per) == 3


def test_weighted_sample_small_fractional_weights(spark):
    """Regression (round-5 review): quality-score weights < 1 must keep
    positive inclusion probability — the old u^(1/w) key rounded to 0 for
    ~quarter of rows at w=0.05. Log-domain key never underflows; NULL ids
    are excluded like every other sampler."""
    from pyspark.sql import functions as F

    from shovel_spark.operators.sampling import weighted_sample_k

    df = spark.createDataFrame(
        [(i, 0.05) for i in range(100)], "doc_id long, w double"
    )
    got = {r.doc_id for r in weighted_sample_k(df, 100, "w").collect()}
    assert len(got) == 100  # every positive-weight row can be selected
    sub = {r.doc_id for r in weighted_sample_k(df, 30, "w").collect()}
    assert len(sub) == 30

    with_null = df.unionByName(
        spark.createDataFrame([(None, 5.0), (None, 5.0)], "doc_id long, w double")
    )
    a = {r.doc_id for r in weighted_sample_k(with_null, 50, "w").collect()}
    b = {r.doc_id for r in weighted_sample_k(with_null.repartition(13), 50, "w").collect()}
    assert a == b and None not in a


def test_pack_blocks_contiguous_stream(spark, docs):
    """Concat-then-chunk invariants: offsets are exactly the exclusive
    prefix sum in id order (each doc starts where the previous ended),
    block ids follow from pure arithmetic, and blocks cover the stream
    with no gaps."""
    from shovel_spark.operators.sampling import pack_blocks

    rows = sorted(
        pack_blocks(docs, "n_tok", block_len=64, num_partitions=5).collect(),
        key=lambda r: r.doc_id,
    )
    expect_start = 0
    for r in rows:
        assert r.tok_start == expect_start, r
        assert r.first_block == r.tok_start // 64
        assert r.last_block == (r.tok_start + max(r.n_tok, 1) - 1) // 64
        assert r.offset_in_block == r.tok_start % 64
        assert r.n_blocks == r.last_block - r.first_block + 1 >= 1
        expect_start += r.n_tok


def test_pack_blocks_deterministic_across_partitioning(spark, docs):
    from shovel_spark.operators.sampling import pack_blocks

    a = pack_blocks(docs, "n_tok", 128, num_partitions=3).collect()
    b = pack_blocks(docs.repartition(13), "n_tok", 128, num_partitions=9).collect()
    key = lambda rs: sorted((r.doc_id, r.tok_start, r.first_block, r.last_block) for r in rs)
    assert key(a) == key(b)


def test_pack_blocks_validates_args(spark, docs):
    from shovel_spark.operators.sampling import pack_blocks

    with pytest.raises(ValueError):
        pack_blocks(docs, "n_chars", 0)

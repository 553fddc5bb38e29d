"""Count-min sketch: overestimate-only, no-false-negative heavy hitters,
cell-wise mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.sketches import (
    cm_estimate,
    count_min_build,
    heavy_hitters,
)


def _skewed(spark, n=3000):
    # key 'hot' ~ 1/3 of rows; the rest spread over ~200 keys
    return spark.range(n).select(
        F.when(F.col("id") % 3 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 200).cast("string")))
        .alias("key")
    )


def test_estimates_never_undercount(spark):
    df = _skewed(spark)
    exact = {r.key: r.c for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    sketch = count_min_build(df, "key", depth=4, width=64)  # narrow: force collisions
    est = {
        r.key: r.est
        for r in cm_estimate(sketch, df.select("key").distinct(), "key", 4, 64).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # narrow sketch must actually collide somewhere (else the test is vacuous)
    assert any(est[k] > exact[k] for k in exact)


def test_heavy_hitters_no_false_negatives(spark):
    df = _skewed(spark)
    n = df.count()
    hh = {r.key: (r.est, r.exact) for r in
          heavy_hitters(df, "key", min_frac=0.05, depth=4, width=64).collect()}
    exact = {r.key: r.c for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    true_heavy = {k for k, c in exact.items() if c >= int(n * 0.05)}
    assert true_heavy <= set(hh)            # every true heavy hitter surfaces
    assert "hot" in hh
    for k, (est, ex) in hh.items():
        assert est >= ex == exact[k]


def test_sketch_cells_merge_additively(spark):
    """Mergeability — the property that lets per-worker sketches combine
    like the reference's aggregated metrics: build(A ∪ B) == cellwise
    build(A) + build(B)."""
    a, b = _skewed(spark, 1000), _skewed(spark, 700)
    cells = lambda df: {
        (r.row, r.bucket): r.c for r in count_min_build(df, "key", 4, 64).collect()
    }
    ca, cb, cu = cells(a), cells(b), cells(a.unionAll(b))
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert cu == merged


def test_hll_accuracy_and_merge(spark):
    """HLL: estimate within the m=64 error envelope across 3 orders of
    magnitude; registers merge by MAX (the union property); duplicate
    rows never move a register."""
    from shovel_spark.operators.sketches import hll_build, hll_cardinality

    def keyed(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("k")
        )

    for true in (40, 1234, 20000):
        df = keyed(0, true)
        est = hll_cardinality(hll_build(df, "k", b=6), b=6).first().est
        assert abs(est - true) / true < 0.35, (true, est)  # ~2.7 sigma at m=64

    # union property: max-merge of two sketches == sketch of the union
    a, b = keyed(0, 800), keyed(500, 1500)
    ra = hll_build(a, "k", b=6).withColumnRenamed("reg", "ra")
    rb = hll_build(b, "k", b=6).withColumnRenamed("reg", "rb")
    merged = (
        ra.join(rb, "bucket", "full")
        .select("bucket",
                F.greatest(F.coalesce("ra", F.lit(0)), F.coalesce("rb", F.lit(0))).alias("reg"))
    )
    union_regs = hll_build(a.unionAll(b), "k", b=6)
    assert {(r.bucket, r.reg) for r in merged.collect()} == \
           {(r.bucket, r.reg) for r in union_regs.collect()}

    # duplicates are invisible to registers
    dup = hll_build(a.unionAll(a).unionAll(a), "k", b=6)
    assert {(r.bucket, r.reg) for r in dup.collect()} == \
           {(r.bucket, r.reg) for r in hll_build(a, "k", b=6).collect()}


def test_hll_small_range_uses_linear_counting(spark):
    """Tiny cardinalities route through the linear-counting branch and
    land very close (it's near-exact when most buckets are empty)."""
    from shovel_spark.operators.sketches import hll_build, hll_cardinality

    df = spark.range(7).select(F.concat(F.lit("x"), F.col("id").cast("string")).alias("k"))
    r = hll_cardinality(hll_build(df, "k", b=6), b=6).first()
    assert r.nonzero <= 7
    assert abs(r.est - 7) < 2.5


def test_bloom_no_false_negatives_and_prunes(spark):
    """Bloom semi-filter: every true key survives (no false negatives);
    most non-keys are pruned; the filter frame carries no key columns
    back into the output."""
    from shovel_spark.operators.sketches import bloom_build, bloom_filter

    keys = spark.range(100).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("k")
    )
    bloom = bloom_build(keys, "k", m_bits=4096, k=4)
    probe = spark.range(5000).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("k")
    )
    kept = bloom_filter(probe, bloom, "k", m_bits=4096, k=4)
    assert kept.columns == ["k"]
    got = {r.k for r in kept.collect()}
    assert {f"u{i}" for i in range(100)} <= got        # no false negatives
    assert len(got) < 100 + 0.05 * 4900                # fp rate well under 5%


def test_bloom_tiny_filter_has_false_positives_but_never_misses(spark):
    """An overloaded filter (64 bits, 200 keys) floods with false
    positives yet still never misses — the guarantee is one-sided."""
    from shovel_spark.operators.sketches import bloom_build, bloom_filter

    keys = spark.range(200).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(keys, "k", m_bits=64, k=2)
    probe = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    got = {r.k for r in bloom_filter(probe, bloom, "k", m_bits=64, k=2).collect()}
    assert {str(i) for i in range(200)} <= got
    assert len(got) > 200  # saturation forces false positives


def test_cm_estimate_absent_key_is_zero_not_missing(spark):
    """A candidate key absent from the build estimates 0 (left join +
    coalesce) — it must not vanish from the output."""
    from shovel_spark.operators.sketches import cm_estimate, count_min_build

    built = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    sketch = count_min_build(built, "k", depth=4, width=256)
    probe = spark.createDataFrame([("a",), ("zz-not-built",)], "k string")
    est = {r.k: r.est for r in cm_estimate(sketch, probe, "k", 4, 256).collect()}
    assert est["a"] >= 2
    assert est["zz-not-built"] == 0


def test_bloom_filter_reads_stored_parameters(spark):
    """bloom_filter defaults m_bits/k to the values stored in the filter
    row — a build/probe parameter mismatch would break the
    no-false-negative guarantee."""
    from shovel_spark.operators.sketches import bloom_build, bloom_filter

    keys = spark.range(50).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(keys, "k", m_bits=8192, k=6)  # non-default params
    probe = spark.range(200).select(F.col("id").cast("string").alias("k"))
    got = {r.k for r in bloom_filter(probe, bloom, "k").collect()}  # no params
    assert {str(i) for i in range(50)} <= got


def test_hll_grouped_matches_ungrouped_per_group(spark):
    """Grouped registers for one group == ungrouped registers over that
    group's rows; the algebraic absent-bucket correction matches the
    dense-frame estimate; per-group merge is max."""
    from shovel_spark.operators.sketches import (
        hll_build,
        hll_build_grouped,
        hll_cardinality,
        hll_cardinality_grouped,
    )

    df = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("u"), (F.col("id") % ((F.col("id") % 3) * 300 + 100)).cast("string")).alias("k"),
    )
    gre = {(r.g, r.bucket, r.reg) for r in hll_build_grouped(df, "g", "k", b=6).collect()}
    for g in ("0", "1", "2"):
        solo = {("%s" % g, r.bucket, r.reg)
                for r in hll_build(df.filter(F.col("g") == g), "k", b=6).collect()}
        assert solo == {t for t in gre if t[0] == g}
    ge = {r.g: r.est for r in hll_cardinality_grouped(
        hll_build_grouped(df, "g", "k", b=6), "g", b=6).collect()}
    for g in ("0", "1", "2"):
        solo_est = hll_cardinality(hll_build(df.filter(F.col("g") == g), "k", b=6), b=6).first().est
        assert abs(ge[g] - solo_est) < 1e-9, (g, ge[g], solo_est)


def test_hll_null_keys_excluded_grouped_and_plain(spark):
    """Regression (round-5 review): NULL keys must not create a phantom
    max-rho register (grouped estimate inflation); both builds drop them,
    matching countDistinct semantics."""
    from shovel_spark.operators.sketches import (
        hll_build,
        hll_build_grouped,
        hll_cardinality_grouped,
    )

    df = spark.createDataFrame(
        [("g1", f"u{i}") for i in range(20)] + [("g1", None)] * 50 + [("g2", None)] * 5,
        "g string, k string",
    )
    regs = hll_build_grouped(df, "g", "k", b=6)
    assert regs.filter(F.col("bucket").isNull()).count() == 0
    assert regs.filter(F.col("g") == "g2").count() == 0  # all-NULL group: no registers
    est = {r.g: r.est for r in hll_cardinality_grouped(regs, "g", b=6).collect()}
    assert abs(est["g1"] - 20) < 6
    plain = hll_build(df.filter(F.col("g") == "g1"), "k", b=6)
    assert plain.filter(F.col("bucket").isNull()).count() == 0


def test_sketch_merges_equal_whole_build(spark):
    """hll_merge / cm_merge / bloom_merge of two disjoint shards produce
    exactly the sketch a single build over the union would — the
    lossless-union property the cross-shard path depends on."""
    from shovel_spark.operators.sketches import (
        bloom_build,
        bloom_merge,
        cm_merge,
        count_min_build,
        hll_build,
        hll_merge,
    )

    df = spark.createDataFrame(
        [(f"k{i % 37}",) for i in range(500)], "k string"
    ).withColumn("id", F.monotonically_increasing_id())
    a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")

    whole = {r.bucket: r.reg for r in hll_build(df, "k", b=6).collect()}
    merged = {r.bucket: r.reg for r in hll_merge(hll_build(a, "k", b=6), hll_build(b, "k", b=6)).collect()}
    assert merged == whole

    wc = {(r.row, r.bucket): r.c for r in count_min_build(df, "k", depth=3, width=32).collect()}
    mc = {
        (r.row, r.bucket): r.c
        for r in cm_merge(
            count_min_build(a, "k", depth=3, width=32),
            count_min_build(b, "k", depth=3, width=32),
        ).collect()
    }
    assert mc == wc

    wb = bloom_build(df, "k", m_bits=1024, k=3).first()
    mb = bloom_merge(
        bloom_build(a, "k", m_bits=1024, k=3),
        bloom_build(b, "k", m_bits=1024, k=3),
    ).first()
    assert list(mb.bits) == list(wb.bits)
    assert mb["__m_bits"] == 1024 and mb["__k"] == 3


def test_bloom_merge_rejects_mismatched_params(spark):
    from shovel_spark.operators.sketches import bloom_build, bloom_merge

    df = spark.createDataFrame([("x",)], "k string")
    fa = bloom_build(df, "k", m_bits=1024, k=3)
    fb = bloom_build(df, "k", m_bits=2048, k=3)
    with pytest.raises(ValueError, match="parameter mismatch"):
        bloom_merge(fa, fb)


def test_qhist_bucket_golden_and_inversion(spark):
    """Hand-computed HDR bucket indices at scale=16, s=5, and the
    lower-bound inversion: exact range below 2^5, then (e-5)*32 +
    (iv >> (e-5)) per octave; lower bound reproduces iv truncated to
    its top 6 bits, divided back by the scale."""
    from shovel_spark.operators.sketches import qhist_bucket, qhist_lower

    # (value, expected bucket): iv = floor(v*16)
    cases = [
        (0.0, 0),        # iv=0
        (1.0, 16),       # iv=16 < 32 -> exact
        (1.9375, 31),    # iv=31, last exact bucket
        (2.0, 32),       # iv=32, e=5 -> (0)*32 + 32
        (4.0, 64),       # iv=64, e=6 -> 32 + 32
        (4.125, 65),     # iv=66, e=6 -> 32 + 33
        (-3.0, 0),       # clamped
    ]
    df = spark.createDataFrame([(v,) for v, _ in cases], "v double")
    got = [
        r.b
        for r in df.select(qhist_bucket(F.col("v")).alias("b")).collect()
    ]
    assert got == [b for _, b in cases]
    # inversion: lower bound of bucket 65 is (iv=66 -> top bits 66>>1<<1=66)/16
    lo = (
        spark.createDataFrame([(65,), (31,), (0,)], "bucket long")
        .select(qhist_lower(F.col("bucket")).alias("lo"))
        .collect()
    )
    assert [r.lo for r in lo] == [66 / 16, 31 / 16, 0.0]


def test_qhist_merge_equals_whole_and_quantile_bound(spark):
    """Shard-merge equals the whole-corpus build cell-for-cell, and the
    p50/p90/p99 answers stay within the 2^-s relative bound (plus the
    1/scale quantization floor) of true inverted-CDF quantiles."""
    from shovel_spark.operators.sketches import (
        qhist_build,
        qhist_merge,
        qhist_quantiles,
    )

    vals = [((i * 37) % 1000) / 3.0 + 0.5 for i in range(4000)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double"
    )
    a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    whole = {r.bucket: r.c for r in qhist_build(df, "v").collect()}
    merged_df = qhist_merge(qhist_build(a, "v"), qhist_build(b, "v"))
    merged = {r.bucket: r.c for r in merged_df.collect()}
    assert merged == whole

    import math

    sv = sorted(vals)
    for r in qhist_quantiles(merged_df, [0.5, 0.9, 0.99]).collect():
        true = sv[math.ceil(r.q * len(sv)) - 1]
        assert abs(r.est - true) <= true * 2**-5 + 1 / 16 + 1e-9, (r.q, r.est, true)


def test_merge_guards_catch_larger_parameter_shards(spark):
    """hll_merge(b=)/cm_merge(depth=,width=) fail the job when a shard's
    positional indices exceed the stated parameter bounds — the
    detectable half of the parameter-mismatch contract."""
    from pyspark.errors import SparkRuntimeException
    from shovel_spark.operators.sketches import (
        cm_merge,
        count_min_build,
        hll_build,
        hll_merge,
    )

    df = spark.createDataFrame([(f"k{i}",) for i in range(200)], "k string")
    ok = hll_merge(hll_build(df, "k", b=6), b=6).count()
    assert ok <= 64
    with pytest.raises(SparkRuntimeException, match="out of range"):
        hll_merge(hll_build(df, "k", b=7), b=6).count()
    with pytest.raises(SparkRuntimeException, match="out of range"):
        cm_merge(count_min_build(df, "k", depth=3, width=512), width=256).count()
    with pytest.raises(SparkRuntimeException, match="out of range"):
        cm_merge(count_min_build(df, "k", depth=5, width=256), depth=4).count()

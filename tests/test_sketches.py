"""Count-min sketch: overestimate-only, no-false-negative heavy hitters,
cell-wise mergeability."""

from __future__ import annotations

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

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from shovel_spark.operators.graph import pagerank


def _numpy_pagerank(edges: list[tuple[int, int]], n: int, iters: int, d: float = 0.85):
    """Reference power iteration with uniform dangling redistribution —
    the exact semantics pagerank() claims."""
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / deg[s]
        dangling = r[deg == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return r


EDGES = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 4)]  # node 4 dangling


def _ranks(spark, edges, iters, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, iters=iters, **kw).collect()
    return {r["node"]: r["rank"] for r in rows}


def test_pagerank_matches_power_iteration(spark):
    got = _ranks(spark, EDGES, iters=4)
    want = _numpy_pagerank(EDGES, 5, 4)
    assert set(got) == set(range(5))
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], abs=1e-12)


def test_pagerank_mass_conserved_and_dangling(spark):
    got = _ranks(spark, EDGES, iters=3)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # node 2 has the most in-links → highest rank; dangling node 4 exists
    assert got[2] == max(got.values())
    assert 4 in got


def test_pagerank_zero_iters_uniform(spark):
    got = _ranks(spark, EDGES, iters=0)
    assert all(v == pytest.approx(1 / 5) for v in got.values())


def test_pagerank_cycle_is_uniform_fixed_point(spark):
    cyc = [(i, (i + 1) % 4) for i in range(4)]
    got = _ranks(spark, cyc, iters=5)
    for v in got.values():
        assert v == pytest.approx(0.25, abs=1e-12)


def test_pagerank_deterministic_across_partitioning(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    a = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    b = {r["node"]: r["rank"] for r in pagerank(df.repartition(7), iters=3).collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_pagerank_validates_args(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iters=-1)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.5)


def test_pagerank_no_cartesian_beyond_broadcast(spark):
    """The only cross joins are 1-row broadcast scalars — the executed plan
    must contain no CartesianProduct."""
    df = spark.createDataFrame(EDGES, "src long, dst long")
    plan = pagerank(df, iters=2, checkpoint=False)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

"""Crawl frontier: hand-computed schedule, single-owner workers, and the
WindowGroupLimit map-side pruning the operator exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from shovel_spark.operators.frontier import frontier_next, host_worker


def _frontier_df(spark):
    rows = [
        # host a: 4 urls, priorities 9,7,7,1 -> top-3 = 1(9), 2(7), 3(7 tie by id)
        (1, "a.com", 9), (2, "a.com", 7), (3, "a.com", 7), (4, "a.com", 1),
        # host b: 2 urls -> both selected
        (5, "b.com", 5), (6, "b.com", 8),
    ]
    return spark.createDataFrame(rows, "id long, host string, prio long")


def test_frontier_ranking_and_tiebreak(spark):
    got = {
        r.id: (r.rank, r.worker)
        for r in frontier_next(
            _frontier_df(spark), "host", "id", priority_col="prio",
            per_host=3, n_workers=4,
        ).collect()
    }
    assert set(got) == {1, 2, 3, 5, 6}  # id 4 pruned by the budget
    assert got[1][0] == 1 and got[2][0] == 2 and got[3][0] == 3
    assert got[6][0] == 1 and got[5][0] == 2  # b ordered by prio desc


def test_frontier_single_owner_per_host(spark):
    out = frontier_next(
        _frontier_df(spark), "host", "id", priority_col="prio", n_workers=3
    )
    per_host = out.groupBy("host").agg(
        F.count_distinct("worker").alias("nw")
    ).collect()
    assert all(r.nw == 1 for r in per_host)
    # and the worker is the stateless host hash, reproducible standalone
    w = out.filter("host = 'a.com'").select("worker").first()["worker"]
    expect = (
        _frontier_df(spark)
        .select(host_worker(F.lit("a.com"), 3).alias("w"))
        .first()["w"]
    )
    assert w == expect


def test_frontier_plan_uses_window_group_limit(spark):
    """The rank<=K filter must compile to WindowGroupLimit — the map-side
    hot-host pruning is the operator's scale contract, not an accident."""
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("host"),
        (F.col("id") % 13).alias("prio"),
    )
    plan = (
        frontier_next(df, "host", "id", priority_col="prio", per_host=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan


def test_parse_sitemap_fields_and_defaults(spark):
    from shovel_spark.operators.frontier import parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc>/a</loc><lastmod>2026-01-05</lastmod><priority>0.9</priority></url>"
        "<url><loc>/b</loc></url>"          # no lastmod, no priority -> 0.5
        "<url><priority>0.1</priority></url>"  # no loc -> dropped
        "</urlset>"
    )
    rows = {
        r.loc: r
        for r in parse_sitemap(
            spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
        ).collect()
    }
    assert set(rows) == {"/a", "/b"}
    assert rows["/a"].lastmod == "2026-01-05" and rows["/a"].priority == 0.9
    assert rows["/b"].lastmod is None and rows["/b"].priority == 0.5


def test_sitemap_feeds_frontier(spark):
    from shovel_spark.operators.frontier import frontier_next, parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc>/hi</loc><priority>0.9</priority></url>"
        "<url><loc>/mid</loc><priority>0.5</priority></url>"
        "<url><loc>/lo</loc><priority>0.1</priority></url>"
        "</urlset>"
    )
    parsed = parse_sitemap(
        spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
    )
    top2 = frontier_next(parsed, "host", "loc", priority_col="priority", per_host=2)
    assert [r.loc for r in top2.orderBy("rank").collect()] == ["/hi", "/mid"]


def test_parse_sitemap_malformed_priority_degrades_to_default(spark):
    """Sitemaps are untrusted crawled content: a non-numeric or
    comma-decimal <priority> must fall to the 0.5 default (try_cast),
    not kill the batch under ANSI mode."""
    from shovel_spark.operators.frontier import parse_sitemap

    xml = (
        "<urlset>"
        "<url><loc>/a</loc><priority>high</priority></url>"
        "<url><loc>/b</loc><priority>0,8</priority></url>"
        "<url><loc>/c</loc><priority>0.8</priority></url>"
        "</urlset>"
    )
    rows = {
        r.loc: r.priority
        for r in parse_sitemap(
            spark.createDataFrame([("h", xml)], "host string, sitemap_xml string")
        ).collect()
    }
    assert rows == {"/a": 0.5, "/b": 0.5, "/c": 0.8}

"""Crawl-frontier scheduling — politeness-aware next-batch selection.

The reference is a crawl/log shuttling daemon; the piece that precedes it
in a production crawl is the frontier: of the millions of queued URLs per
host, pick the next K per host (politeness budget) and hand each host to
exactly ONE fetch worker (so per-host rate limits are enforceable without
cross-worker coordination — the same single-owner argument as shovel's
per-connection input channels, reference: src/inputs/amqp.js:8-50).

Scale shape: the per-host top-K is a rank filter that Spark compiles to
WindowGroupLimit — each input partition pre-prunes to at most K rows PER
HOST map-side BEFORE the shuffle, so a hot host (the classic frontier
skew: one domain with 10^8 queued URLs) contributes at most
K * n_input_partitions rows to the exchange instead of its whole queue.
Worker assignment is a stateless md5 hash of the host — engine-neutral
(the same arithmetic as the sketch family), so an external SQL engine
replays the whole schedule.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def host_worker(host: Column, n_workers: int) -> Column:
    """Stable worker id for a host: the shared engine-neutral md5_mod
    idiom (sketches.md5_mod) — one owner per host, identical in any
    engine."""
    from shovel_spark.operators.sketches import md5_mod

    return md5_mod(host, n_workers)


def frontier_next(
    df: DataFrame,
    host_col: str,
    id_col: str,
    priority_col: str | None = None,
    per_host: int = 5,
    n_workers: int = 4,
) -> DataFrame:
    """The next crawl batch: per ``host_col``, the top ``per_host`` rows
    by (priority desc, id asc — the id breaks ties deterministically),
    each tagged with its owning worker. Returns the input columns plus
    (rank, worker).

    The rank <= K filter on an unbounded-frame row_number compiles to
    WindowGroupLimit (verified by plan test): the hot-host queue is
    pruned map-side, which is the entire point of expressing the
    frontier this way rather than groupBy(host).collect_list().
    """
    order = (
        [F.col(priority_col).desc(), F.col(id_col).asc()]
        if priority_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(host_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_host)
        .withColumn("worker", host_worker(F.col(host_col), n_workers))
    )


def parse_sitemap(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """(host, loc, lastmod, priority) rows from sitemap.xml urlset bodies
    — the discovery companion to robots.txt: hosts advertise their URLs
    (with optional freshness and priority hints) and the crawler seeds
    its frontier from them. Extraction is anchored regexp work over
    <url> blocks (map-only, no XML library, no Python): the sitemap
    format's flat fixed tags make regexp extraction exact here, unlike
    general HTML. Missing <priority> defaults to 0.5 (the sitemaps.org
    default), and so does a MALFORMED one ("high", "0,8" — sitemaps are
    untrusted crawled content, so the cast is try_cast: one host's junk
    must degrade to the default, not kill the batch under ANSI mode);
    missing <lastmod> stays NULL; entries without a <loc> are dropped.
    Feed the result straight into frontier_next with
    priority_col="priority"."""
    blocks = df.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), 1)
        ).alias("__b"),
    )
    return blocks.select(
        "host",
        F.regexp_extract("__b", r"(?s)<loc>(.*?)</loc>", 1).alias("loc"),
        F.nullif(
            F.regexp_extract("__b", r"(?s)<lastmod>(.*?)</lastmod>", 1), F.lit("")
        ).alias("lastmod"),
        F.coalesce(
            F.regexp_extract("__b", r"(?s)<priority>(.*?)</priority>", 1)
            .try_cast("double"),
            F.lit(0.5),
        ).alias("priority"),
    ).filter(F.length("loc") > 0)

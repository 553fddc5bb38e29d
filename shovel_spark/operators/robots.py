"""robots.txt compliance — parse crawl policies, filter a URL frontier.

The operator pair a crawler runs between frontier selection
(operators/frontier.py) and the fetch itself: parse each host's
robots.txt into (agent, rule, prefix) rows, then admit or drop queued
URLs by the standard longest-prefix-match election (RFC 9309 §2.2.2:
the most specific matching rule wins; Allow beats Disallow on equal
length; no matching rule means allowed).

Parsing robots.txt is line-oriented and STATEFUL (a rule line belongs to
the most recent preceding User-agent group), which in DataFrame terms is
a per-host posexplode + a last_value window ordered by line index —
bounded by one robots file's line count (a few hundred lines), never by
the corpus. Group semantics are simplified to single-agent groups (each
User-agent line opens a group; consecutive User-agent lines sharing one
rule block are out of scope and documented).

Scale shape: the rules table is hosts × rules — tiny next to the
frontier — and broadcasts into the URL join; the election is a
groupBy(url) max over matched rules (each URL matches at most the
handful of prefixes its host declares). Everything is engine-neutral
string/integer work, so an external SQL engine replays admit/deny
verdicts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, rule, prefix) rows from raw robots.txt bodies.

    Lines are trimmed; comments (#...) stripped; ``User-agent:`` opens a
    group (its value lower-cased); ``Allow:`` / ``Disallow:`` lines
    attach to the most recent group via a running last_value window per
    host (bounded by the file's line count). Rules before any User-agent
    line and empty-prefix Disallow lines (RFC: "Disallow:" with no value
    means allow everything) are dropped.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("idx", "__raw"),
    ).select(
        "host",
        "idx",
        F.trim(F.regexp_replace("__raw", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "idx",
        F.when(
            F.lower("line").startswith("user-agent:"),
            F.lower(F.trim(F.expr("substring(line, 12)"))),
        ).alias("__agent_open"),
        F.when(
            F.lower("line").startswith("allow:"), F.trim(F.expr("substring(line, 7)"))
        ).alias("__allow"),
        F.when(
            F.lower("line").startswith("disallow:"),
            F.trim(F.expr("substring(line, 10)")),
        ).alias("__disallow"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_group = parsed.withColumn(
        "agent", F.last("__agent_open", ignorenulls=True).over(w)
    )
    return (
        with_group.filter(F.col("agent").isNotNull())
        .select(
            "host",
            "agent",
            F.when(F.col("__allow").isNotNull(), F.lit("allow"))
            .when(F.col("__disallow").isNotNull(), F.lit("disallow"))
            .alias("rule"),
            F.coalesce("__allow", "__disallow").alias("prefix"),
        )
        .filter(F.col("rule").isNotNull() & (F.length("prefix") > 0))
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    agent: str = "*",
) -> DataFrame:
    """The input URLs with an ``allowed`` verdict column, by RFC 9309
    longest-match: among the agent's rules whose prefix starts the URL
    path, the longest prefix wins; Allow wins length ties; a URL with no
    matching rule is allowed.

    The rules side broadcasts (hosts × rules — policy-sized, not
    data-sized); the election is one map-side-combinable max of a
    (length, is_allow) struct per URL."""
    r = rules.filter(F.col("agent") == agent.lower()).select(
        F.col("host").alias("__rhost"),
        "rule",
        "prefix",
        F.length("prefix").alias("__plen"),
    )
    matched = (
        urls.join(
            F.broadcast(r),
            (F.col(host_col) == F.col("__rhost"))
            & F.col(path_col).startswith(F.col("prefix")),
            "left",
        )
        .groupBy(*urls.columns)
        .agg(
            F.max(
                F.when(
                    F.col("rule").isNotNull(),
                    F.struct(
                        F.col("__plen").alias("l"),
                        (F.col("rule") == "allow").cast("int").alias("a"),
                    ),
                )
            ).alias("__win")
        )
    )
    return matched.select(
        *urls.columns,
        F.coalesce(F.col("__win.a") == 1, F.lit(True)).alias("allowed"),
    )

"""robots.txt compliance — parse crawl policies, filter a URL frontier.

The operator pair a crawler runs between frontier selection
(operators/frontier.py) and the fetch itself: parse each host's
robots.txt into (agent, rule, prefix) rows, then admit or drop queued
URLs by the RFC 9309 election: among the governing group's matching
rules the most specific (longest pattern) wins, Allow beats Disallow on
ties, and a URL with no matching rule is allowed. The governing group is
the requested agent's own group when the host declares one, else the
``*`` group (§2.2.1); rule paths support the §2.2.3 special characters
``*`` (any chars) and trailing ``$`` (end anchor).

Parsing robots.txt is line-oriented and STATEFUL (a rule line belongs to
the most recent preceding User-agent group), which in DataFrame terms is
a per-host posexplode + a last_value window ordered by line index —
bounded by one robots file's line count (a few hundred lines), never by
the corpus. Lines end with LF, CRLF, or CR (§2.1) — the splitter and a
whitespace trim handle all three, so a CRLF policy parses identically to
a LF one. Group semantics are simplified to single-agent groups (each
User-agent line opens a group; consecutive User-agent lines sharing one
rule block are out of scope and documented).

Scale shape: the rules table is hosts × rules — tiny next to the
frontier — and broadcasts into the URL join; the election is a
groupBy max over matched rules (each URL matches at most the handful of
prefixes its host declares). Wildcard-free prefixes match via
``startswith`` (whole-stage codegen); only rules that actually use
``*``/``$`` take the regexp path. Everything is engine-neutral
string/integer work, so an external SQL engine replays admit/deny
verdicts exactly (the registered oracle covers the wildcard-free path;
wildcard semantics are pytest-verified).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _wtrim(c: Column) -> Column:
    """Whitespace trim that, unlike F.trim, also strips \\r and \\t —
    required for CRLF robots.txt files, where a space-only trim leaves a
    trailing \\r glued to every agent and prefix."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def parse_robots(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, rule, prefix) rows from raw robots.txt bodies.

    Lines are split on LF/CRLF/CR and whitespace-trimmed; comments
    (#...) stripped; ``User-agent:`` opens a group (its value
    lower-cased); ``Allow:`` / ``Disallow:`` lines attach to the most
    recent group via a running last_value window per host (bounded by
    the file's line count). Rules before any User-agent line and
    empty-prefix Disallow lines (RFC: "Disallow:" with no value means
    allow everything) are dropped — but every group DECLARATION survives
    as a marker row with rule/prefix NULL, so a group that exists with
    zero rules (the standard "this bot is exempt" idiom) is still
    visible to robots_filter's §2.2.1 fallback decision.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\r\n|\r|\n")).alias("idx", "__raw"),
    ).select(
        "host",
        "idx",
        _wtrim(F.regexp_replace("__raw", "#.*$", "")).alias("line"),
    )
    parsed = lines.select(
        "host",
        "idx",
        F.when(
            F.lower("line").startswith("user-agent:"),
            F.lower(_wtrim(F.expr("substring(line, 12)"))),
        ).alias("__agent_open"),
        F.when(
            F.lower("line").startswith("allow:"), _wtrim(F.expr("substring(line, 7)"))
        ).alias("__allow"),
        F.when(
            F.lower("line").startswith("disallow:"),
            _wtrim(F.expr("substring(line, 10)")),
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
    shaped = with_group.filter(F.col("agent").isNotNull()).select(
        "host",
        "agent",
        F.when(F.col("__allow").isNotNull(), F.lit("allow"))
        .when(F.col("__disallow").isNotNull(), F.lit("disallow"))
        .alias("rule"),
        F.coalesce("__allow", "__disallow").alias("prefix"),
        F.col("__agent_open").isNotNull().alias("__is_decl"),
    )
    return shaped.filter(
        (F.col("rule").isNotNull() & (F.length("prefix") > 0)) | F.col("__is_decl")
    ).select(
        "host",
        "agent",
        F.when(F.col("__is_decl"), F.lit(None).cast("string"))
        .otherwise(F.col("rule"))
        .alias("rule"),
        F.when(F.col("__is_decl"), F.lit(None).cast("string"))
        .otherwise(F.col("prefix"))
        .alias("prefix"),
    )


def _prefix_pattern(prefix: Column) -> Column:
    """RFC 9309 §2.2.3 rule path → anchored Java/RE2-compatible regex:
    regex metacharacters are escaped, ``*`` becomes ``.*``, a TRAILING
    ``$`` becomes an end anchor. Only used for rules that contain a
    special character — plain prefixes take the startswith fast path."""
    esc = F.regexp_replace(prefix, r"([.^+?(){}\[\]|\\$])", r"\\$1")
    esc = F.regexp_replace(esc, r"\\\$$", "\\$")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), esc)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
    agent: str = "*",
) -> DataFrame:
    """The input URLs (row-for-row, duplicates preserved) with an
    ``allowed`` verdict column, by RFC 9309 longest-match: among the
    governing group's rules that match the URL path, the longest rule
    path wins; Allow wins length ties; a URL with no matching rule is
    allowed. The governing group is the requested agent's own group for
    hosts that declare one, the ``*`` group otherwise (§2.2.1).

    The rules side broadcasts (hosts × rules — policy-sized, not
    data-sized); the election is one map-side-combinable max of a
    (length, is_allow) struct per URL row."""
    wanted = agent.lower()
    # one pre-filtered, lazily-materialized pass over the parse lineage —
    # spec, star and spec_hosts otherwise each re-run the posexplode +
    # window. eager=False (r6 ADVICE): repeated filter calls against an
    # already-cached rules table must not pay an up-front parse job per
    # invocation; the checkpoint still pins the lineage at first use.
    relevant = rules.filter(F.col("agent").isin(wanted, "*")).localCheckpoint(eager=False)
    spec = relevant.filter(F.col("agent") == wanted)
    star = relevant.filter(F.col("agent") == "*")
    # hosts with a group for the requested agent use ONLY that group —
    # including a group declared with zero rules (parse_robots keeps the
    # declaration as a rule=NULL marker row; §2.2.1 says such a group
    # means everything-allowed, NOT fall through to '*'); everyone else
    # falls back to '*'. Both sides are policy-sized.
    if wanted != "*":
        spec_hosts = spec.select("host").distinct()
        governing = spec.unionByName(
            star.join(spec_hosts, "host", "left_anti")
        )
    else:
        governing = star
    governing = governing.filter(F.col("rule").isNotNull())  # drop markers
    has_special = F.col("prefix").contains("*") | F.col("prefix").endswith("$")
    r = governing.select(
        F.col("host").alias("__rhost"),
        "rule",
        "prefix",
        F.length("prefix").alias("__plen"),
        F.when(has_special, _prefix_pattern(F.col("prefix"))).alias("__pat"),
    )
    tagged = urls.withColumn("__rowid", F.monotonically_increasing_id())
    match = F.when(
        F.col("__pat").isNotNull(), F.regexp_like(F.col(path_col), F.col("__pat"))
    ).otherwise(F.col(path_col).startswith(F.col("prefix")))
    matched = (
        tagged.join(
            F.broadcast(r),
            (F.col(host_col) == F.col("__rhost")) & match,
            "left",
        )
        .groupBy("__rowid", *urls.columns)
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

"""robots.txt parsing and RFC 9309 longest-match filtering."""

from __future__ import annotations

from shovel_spark.operators.robots import parse_robots, robots_filter

ROBOTS = (
    "# crawl policy\n"
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/ok\n"
    "Disallow: /tmp   # trailing comment\n"
    "\n"
    "User-agent: BadBot\n"
    "Disallow: /\n"
)


def _rules(spark, pairs):
    return parse_robots(
        spark.createDataFrame(pairs, "host string, robots_txt string")
    )


def test_parse_groups_comments_and_empty_disallow(spark):
    rules = _rules(
        spark, [("a.com", ROBOTS), ("b.com", "User-agent: *\nDisallow:\n")]
    ).collect()
    got = {(r.host, r.agent, r.rule, r.prefix) for r in rules}
    assert got == {
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        ("a.com", "*", "disallow", "/tmp"),
        ("a.com", "badbot", "disallow", "/"),  # agent lower-cased
    }  # b.com's empty Disallow (allow-everything) yields no rule rows


def test_longest_match_election_and_agent_isolation(spark):
    rules = _rules(spark, [("a.com", ROBOTS)])
    urls = spark.createDataFrame(
        [
            ("a.com", "/private/ok/x"),   # longer Allow beats Disallow
            ("a.com", "/private/secret"), # Disallow wins
            ("a.com", "/tmp/y"),
            ("a.com", "/pub/z"),          # no rule -> allowed
            ("other.com", "/anything"),   # unknown host -> allowed
        ],
        "host string, path string",
    )
    star = {
        (r.host, r.path): r.allowed for r in robots_filter(urls, rules).collect()
    }
    assert star == {
        ("a.com", "/private/ok/x"): True,
        ("a.com", "/private/secret"): False,
        ("a.com", "/tmp/y"): False,
        ("a.com", "/pub/z"): True,
        ("other.com", "/anything"): True,
    }
    # the badbot group must not leak into '*', and vice versa
    bad = {
        r.path: r.allowed
        for r in robots_filter(urls, rules, agent="BadBot").collect()
        if r.host == "a.com"
    }
    assert bad == {p: False for p in bad}  # Disallow: / blocks all


def test_allow_disallow_equal_length_tie(spark):
    """RFC 9309: Allow wins when prefix lengths tie."""
    rules = _rules(
        spark,
        [("t.com", "User-agent: *\nDisallow: /abc\nAllow: /abc\n")],
    )
    urls = spark.createDataFrame([("t.com", "/abc/page")], "host string, path string")
    assert robots_filter(urls, rules).first().allowed is True

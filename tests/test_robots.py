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
        # group declarations survive as marker rows (rule/prefix NULL)
        ("a.com", "*", None, None),
        ("a.com", "badbot", None, None),
        ("b.com", "*", None, None),
        ("a.com", "*", "disallow", "/private"),
        ("a.com", "*", "allow", "/private/ok"),
        ("a.com", "*", "disallow", "/tmp"),
        ("a.com", "badbot", "disallow", "/"),  # agent lower-cased
    }  # b.com's empty Disallow (allow-everything) yields no RULE rows


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


def test_crlf_and_cr_line_endings_parse_clean(spark):
    """RFC 9309 §2.1: lines end with CR, LF, or CRLF — a CRLF policy
    must parse to the same rules as the LF one (no \\r glued to agents
    or prefixes)."""
    crlf = ROBOTS.replace("\n", "\r\n")
    cr = ROBOTS.replace("\n", "\r")
    want = {
        (r.host, r.agent, r.rule, r.prefix)
        for r in _rules(spark, [("a.com", ROBOTS)]).collect()
    }
    for variant in (crlf, cr):
        got = {
            (r.host, r.agent, r.rule, r.prefix)
            for r in _rules(spark, [("a.com", variant)]).collect()
        }
        assert got == want
    # and verdicts over the CRLF policy still deny /private
    urls = spark.createDataFrame(
        [("a.com", "/private/secret")], "host string, path string"
    )
    assert (
        robots_filter(urls, _rules(spark, [("a.com", crlf)])).first().allowed
        is False
    )


def test_agent_falls_back_to_star_group(spark):
    """§2.2.1: a crawler with no group of its own obeys '*'; a host that
    DOES declare the agent's group uses only that group."""
    rules = _rules(
        spark,
        [
            ("only-star.com", "User-agent: *\nDisallow: /private\n"),
            (
                "both.com",
                "User-agent: *\nDisallow: /\n\n"
                "User-agent: mybot\nDisallow: /private\n",
            ),
        ],
    )
    urls = spark.createDataFrame(
        [
            ("only-star.com", "/private/x"),  # star fallback -> denied
            ("only-star.com", "/pub/x"),      # star fallback -> allowed
            ("both.com", "/pub/x"),           # mybot group governs -> allowed
            ("both.com", "/private/x"),       # mybot group denies
        ],
        "host string, path string",
    )
    got = {
        (r.host, r.path): r.allowed
        for r in robots_filter(urls, rules, agent="MyBot").collect()
    }
    assert got == {
        ("only-star.com", "/private/x"): False,
        ("only-star.com", "/pub/x"): True,
        ("both.com", "/pub/x"): True,
        ("both.com", "/private/x"): False,
    }


def test_wildcard_and_anchor_rules(spark):
    """§2.2.3: '*' matches any chars, trailing '$' anchors the end;
    literal dots must not act as regex wildcards."""
    rules = _rules(
        spark,
        [("w.com", "User-agent: *\nDisallow: /*.pdf\nDisallow: /exact$\nDisallow: /a.b\n")],
    )
    urls = spark.createDataFrame(
        [
            ("w.com", "/docs/report.pdf"),  # matched by /*.pdf
            ("w.com", "/docs/report.pdfx"), # also matched (prefix semantics)
            ("w.com", "/exact"),            # anchored match
            ("w.com", "/exactly"),          # NOT matched ($ anchor)
            ("w.com", "/a.b/c"),            # literal-dot prefix
            ("w.com", "/aXb/c"),            # dot must not match X
        ],
        "host string, path string",
    )
    got = {r.path: r.allowed for r in robots_filter(urls, rules).collect()}
    assert got == {
        "/docs/report.pdf": False,
        "/docs/report.pdfx": False,
        "/exact": False,
        "/exactly": True,
        "/a.b/c": False,
        "/aXb/c": True,
    }


def test_empty_group_exempts_agent_from_star(spark):
    """§2.2.1 regression: a group declared with only an empty Disallow
    ("this bot is exempt") GOVERNS — the agent must not fall through to
    a restrictive '*' group."""
    rules = _rules(
        spark,
        [("h.com", "User-agent: *\nDisallow: /\n\nUser-agent: mybot\nDisallow:\n")],
    )
    urls = spark.createDataFrame([("h.com", "/page")], "host string, path string")
    assert robots_filter(urls, rules, agent="mybot").first().allowed is True
    # while everyone else is still locked out
    assert robots_filter(urls, rules).first().allowed is False


def test_duplicate_url_rows_preserved(spark):
    rules = _rules(spark, [("a.com", ROBOTS)])
    urls = spark.createDataFrame(
        [("a.com", "/tmp/x"), ("a.com", "/tmp/x")], "host string, path string"
    )
    out = robots_filter(urls, rules).collect()
    assert len(out) == 2 and all(r.allowed is False for r in out)

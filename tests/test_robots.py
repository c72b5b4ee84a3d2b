"""Unit tests for operators/robots.py (RFC 9309 semantics)."""

from pyspark.sql import functions as F

from logstash_spark.operators.robots import (
    parse_robots,
    robots_filter,
    robots_like_pattern,
)

_ROBOTS = """# site policy
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp*
Disallow:

User-agent: graftbot
Disallow: /bot-only/
Allow: /

User-agent: legacybot
User-agent: oldbot
Disallow: /
"""


def _setup(spark):
    hosts = spark.createDataFrame(
        [("h1", _ROBOTS), ("h2", "User-agent: *\nDisallow: /x$\n")],
        "host string, robots_txt string",
    )
    return parse_robots(hosts)


def _decide(spark, rules, agent, pairs):
    urls = spark.createDataFrame(pairs, "host string, path string")
    rows = robots_filter(urls, rules, agent).collect()
    return {(r["host"], r["path"]): r["allowed"] for r in rows}


def test_star_group_longest_match_and_wildcards(spark):
    rules = _setup(spark)
    got = _decide(
        spark,
        rules,
        "unknownbot",
        [
            ("h1", "/private/a"),      # Disallow /private/
            ("h1", "/private/ok/a"),   # Allow beats shorter Disallow
            ("h1", "/tmp123"),         # * wildcard
            ("h1", "/bot-only/z"),     # graftbot group does NOT apply
            ("h1", "/public"),         # no rule -> allowed
            ("h2", "/x"),              # $ anchor hits exact path
            ("h2", "/xy"),             # $ anchor must NOT hit longer path
        ],
    )
    assert got == {
        ("h1", "/private/a"): False,
        ("h1", "/private/ok/a"): True,
        ("h1", "/tmp123"): False,
        ("h1", "/bot-only/z"): True,
        ("h1", "/public"): True,
        ("h2", "/x"): False,
        ("h2", "/xy"): True,
    }


def test_specific_agent_group_wins_outright(spark):
    rules = _setup(spark)
    got = _decide(
        spark,
        rules,
        "GraftBot",  # agent matching is case-insensitive
        [
            ("h1", "/bot-only/z"),   # its own Disallow
            ("h1", "/private/a"),    # * group's Disallow must NOT leak in
            ("h2", "/x"),            # no graftbot group on h2 -> * applies
        ],
    )
    assert got == {
        ("h1", "/bot-only/z"): False,
        ("h1", "/private/a"): True,  # graftbot group's Allow: /
        ("h2", "/x"): False,
    }


def test_stacked_agents_share_group(spark):
    rules = _setup(spark)
    for agent in ("legacybot", "oldbot"):
        got = _decide(spark, rules, agent, [("h1", "/anything")])
        assert got == {("h1", "/anything"): False}


def test_empty_disallow_is_noop(spark):
    rules = _setup(spark)
    # the bare "Disallow:" line must not have produced a rule
    assert rules.filter(F.col("path") == "").count() == 0


def test_like_pattern_translation(spark):
    df = spark.createDataFrame(
        [("/a*b$",), ("/p_q%r",), ("/plain",)], "p string"
    )
    got = [
        r["v"]
        for r in df.select(robots_like_pattern("p").alias("v"))
        .orderBy("p")
        .collect()
    ]
    assert got == ["/a%b", r"/p\_q\%r%", "/plain%"]

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


# ---------------------------------------------------------------------------
# sitemap_urls
# ---------------------------------------------------------------------------

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a</loc>
    <lastmod>2026-01-15</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc> https://ex.com/b </loc></url>
</urlset>
"""
_INDEX = (
    "<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc></sitemap>"
    "<sitemap><loc>https://ex.com/s2.xml</loc>"
    "<lastmod>2026-01-17T00:00:00Z</lastmod></sitemap></sitemapindex>"
)


def test_sitemap_urlset(spark):
    from logstash_spark.operators.robots import sitemap_urls

    df = spark.createDataFrame([(1, _URLSET)], "fid int, sitemap_xml string")
    rows = sitemap_urls(df).orderBy("entry_no").collect()
    assert len(rows) == 2 and not rows[0]["is_index"]
    assert rows[0]["loc"] == "https://ex.com/a"
    assert rows[0]["lastmod"] == "2026-01-15"
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["loc"] == "https://ex.com/b"  # whitespace trimmed
    assert rows[1]["priority"] is None and rows[1]["lastmod"] == ""


def test_sitemap_index(spark):
    from logstash_spark.operators.robots import sitemap_urls

    df = spark.createDataFrame([(1, _INDEX)], "fid int, sitemap_xml string")
    rows = sitemap_urls(df).orderBy("entry_no").collect()
    assert [r["loc"] for r in rows] == [
        "https://ex.com/s1.xml",
        "https://ex.com/s2.xml",
    ]
    assert all(r["is_index"] for r in rows)
    assert rows[1]["lastmod"] == "2026-01-17T00:00:00Z"


def test_sitemap_plan_zero_shuffle(spark):
    from logstash_spark.operators.robots import sitemap_urls

    df = spark.createDataFrame([(1, _URLSET)], "fid int, sitemap_xml string")
    out = sitemap_urls(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

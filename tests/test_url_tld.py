"""Unit goldens for the round-3 breadth batch: tld / age / alter /
metricize / url_normalize / host hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.functions import age, alter, domain_parts, tld
from logstash_spark.operators.dataprep import (
    host_blocklist_filter,
    host_stats,
    url_host,
    url_normalize,
)
from logstash_spark.operators.multiplicity import metricize


def test_tld_decomposition(spark):
    df = spark.createDataFrame(
        [
            ("www.example.co.uk",),
            ("sub.a.example.com",),
            ("example.org",),
            ("localhost",),
            ("WWW.UPPER.COM",),
        ],
        "host string",
    )
    rows = {r.host: r for r in tld(df, "host").collect()}
    r = rows["www.example.co.uk"]
    assert (r.tld, r.sld, r.trd, r.domain) == ("co.uk", "example", "www", "example.co.uk")
    r = rows["sub.a.example.com"]
    assert (r.tld, r.sld, r.trd, r.domain) == ("com", "example", "sub.a", "example.com")
    r = rows["example.org"]
    assert (r.tld, r.sld, r.trd, r.domain) == ("org", "example", None, "example.org")
    # a bare single label is all-suffix: no registrable domain
    r = rows["localhost"]
    assert (r.tld, r.sld, r.trd, r.domain) == ("localhost", None, None, None)
    # decomposition is case-insensitive
    r = rows["WWW.UPPER.COM"]
    assert (r.domain, r.trd) == ("upper.com", "www")


def test_url_normalize_goldens(spark):
    cases = [
        # default port stripped, scheme+host lowered, params sorted, utm dropped
        (
            "HTTP://WWW.Ex.CO.UK:80/P?utm_source=x&b=2&a=1#f",
            "http://www.ex.co.uk/P?a=1&b=2",
        ),
        # https:443 is default; empty path becomes /
        ("https://Shop.Ex.com:443?gclid=9", "https://shop.ex.com/"),
        # non-default port survives
        ("http://h.ex.org:8080/a", "http://h.ex.org:8080/a"),
        # :80 on https is NOT default — kept
        ("https://h.ex.org:80/", "https://h.ex.org:80/"),
        # unparseable input passes through
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r.url: r.norm
        for r in df.select("url", url_normalize(F.col("url")).alias("norm")).collect()
    }
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_host_stats_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.one.com/x"),
            (2, "https://b.one.com/y"),
            (3, "https://a.one.com/z"),
            (4, "https://spam.bad.co.uk/q"),
            (5, "oops"),
        ],
        "doc_id long, url string",
    )
    block = spark.createDataFrame([("bad.co.uk",)], "domain string")
    kept = host_blocklist_filter(df, block)
    assert {r.doc_id for r in kept.collect()} == {1, 2, 3, 5}
    stats = {r.domain: r for r in host_stats(kept).collect()}
    assert stats["one.com"].n_docs == 3
    assert stats["one.com"].n_hosts == 2
    # unparseable URL contributes no host row
    assert set(stats) == {"one.com"}


def test_metricize_keep_null(spark):
    df = spark.createDataFrame([(1, 10.0, None)], "id int, cpu double, mem double")
    out = metricize(df, ["cpu", "mem"], drop_null=False).collect()
    assert [(r.metric, r.value) for r in out] == [("cpu", 10.0), ("mem", None)]


def test_age_and_alter(spark):
    df = spark.createDataFrame([("2024-01-01 00:00:00",)], "ts string")
    out = age(df, now="2024-01-15 00:00:00", max_age=7 * 86400.0).collect()[0]
    assert out.age == 14 * 86400.0 and "_agefilter" in out.tags

    df2 = spark.createDataFrame(
        [("error", None, "x"), ("ok", 5.0, "y")], "status string, v double, s string"
    )
    out2 = alter(
        df2,
        condrewrite=[("status", "error", "failure")],
        condrewriteother=[("s", "x", "lane", "hot")],
        coalesce=[("first", ["v", "s"])],
    ).collect()
    assert [r.status for r in out2] == ["failure", "ok"]
    assert [r.lane for r in out2] == ["hot", None]
    assert [r.first for r in out2] == ["x", "5.0"]


def test_domain_parts_reuse_matches_tld_op(spark):
    df = spark.createDataFrame([("https://A.B.example.com.au/p",)], "url string")
    parts = domain_parts(url_host(F.col("url")))
    r = df.select(parts["domain"].alias("d"), parts["tld"].alias("t")).collect()[0]
    assert (r.d, r.t) == ("example.com.au", "com.au")

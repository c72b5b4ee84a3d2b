"""Golden grok tests, ported behaviors from logstash-filter-grok's spec
suite (grok_spec.rb — SURVEY.md §5.1): apache combined log, syslog line,
failure tagging, break_on_match, type casts. Both execution paths
(native regexp_extract and pandas-UDF single-pass) must agree.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from logstash_spark.operators.parse import grok

APACHE = (
    '127.0.0.1 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" '
    '200 2326 "http://www.example.com/start.html" "Mozilla/4.08 [en] (Win98; I ;Nav)"'
)
SYSLOG = "Mar 16 00:01:25 evita postfix/smtpd[1713]: connect from camomile.cloud9.net[168.100.1.3]"


@pytest.mark.parametrize("method", ["native", "pandas"])
def test_combined_apache_log(spark, method):
    df = spark.createDataFrame([Row(message=APACHE)])
    out = grok(df, "message", "%{COMBINEDAPACHELOG}", method=method).collect()[0]
    assert out["clientip"] == "127.0.0.1"
    assert out["auth"] == "frank"
    assert out["verb"] == "GET"
    assert out["request"] == "/apache_pb.gif"
    assert out["response"] == 200  # :int cast
    assert out["bytes"] == 2326
    assert out["timestamp"] == "10/Oct/2000:13:55:36 -0700"
    assert out["tags"] == []


@pytest.mark.parametrize("method", ["native", "pandas"])
def test_syslog_line(spark, method):
    df = spark.createDataFrame([Row(message=SYSLOG)])
    out = grok(df, "message", "%{SYSLOGLINE}", method=method).collect()[0]
    assert out["logsource"] == "evita"
    assert out["program"] == "postfix/smtpd"
    assert out["pid"] == 1713
    # the SYSLOGLINE `message` capture overwrites the source field
    # (logstash grok `overwrite` semantics, our default)
    assert out["message"] == "connect from camomile.cloud9.net[168.100.1.3]"


@pytest.mark.parametrize("method", ["native", "pandas"])
def test_grok_failure_tag(spark, method):
    df = spark.createDataFrame([Row(message="not an ip at all")])
    out = grok(df, "message", "%{IP:ip} %{WORD:w}", method=method).collect()[0]
    assert out["ip"] is None
    assert out["tags"] == ["_grokparsefailure"]


@pytest.mark.parametrize("method", ["native", "pandas"])
def test_break_on_match_first_wins(spark, method):
    df = spark.createDataFrame(
        [Row(message="code=42"), Row(message="name=bob"), Row(message="???")]
    )
    out = {
        r["message"]: r
        for r in grok(
            df,
            "message",
            [r"code=%{INT:code:int}", r"name=%{WORD:name}"],
            method=method,
        ).collect()
    }
    assert out["code=42"]["code"] == 42 and out["code=42"]["name"] is None
    assert out["name=bob"]["name"] == "bob" and out["name=bob"]["code"] is None
    assert out["???"]["tags"] == ["_grokparsefailure"]
    assert out["code=42"]["tags"] == []


@pytest.mark.parametrize("method", ["native", "pandas"])
def test_custom_pattern_definitions(spark, method):
    df = spark.createDataFrame([Row(message="order ab-123 shipped")])
    out = grok(
        df,
        "message",
        "order %{ORDERID:oid} shipped",
        pattern_definitions={"ORDERID": r"[a-z]{2}-\d+"},
        method=method,
    ).collect()[0]
    assert out["oid"] == "ab-123"


def test_paths_agree_on_fixture(spark):
    from logstash_spark.sources.gen import input_sequences
    from logstash_spark.plans.flagship import GROK_PATTERN

    df = input_sequences(spark, 500)
    a = grok(df, "raw", GROK_PATTERN, method="native")
    b = grok(df, "raw", GROK_PATTERN, method="pandas")
    cols = ["doc_id", "ts_str", "host", "src", "pid", "level", "msg", "tags"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_dotall_scoped_to_wrapper_only(spark):
    """GREEDYDATA/DATA must not cross embedded newlines (Oniguruma default
    '.' semantics) — only the native path's wrapper is DOTALL. Both
    methods must agree on multi-line input (e.g. multiline-codec output)."""
    df = spark.createDataFrame(
        [("lvl=ERROR msg=first line\nsecond line",)], ["message"]
    )
    for method in ("native", "pandas"):
        out = grok(
            df, "message", r"lvl=%{WORD:lvl} msg=%{GREEDYDATA:msg}", method=method
        ).collect()[0]
        assert out["lvl"] == "ERROR", method
        assert out["msg"] == "first line", method

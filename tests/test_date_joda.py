"""Joda→JDK date translation golden cases (ported shapes from
logstash-filter-date spec: apache, syslog, unix-date, ISO week dates)
plus the strptime fallback for patterns Spark's parser rejects."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators.parse import (
    _joda_to_strptime,
    _spark_unparseable,
    _translate_joda,
    date as date_op,
)


@pytest.mark.parametrize(
    "joda,jdk",
    [
        ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ss"),
        ("YYYY-MM-dd", "yyyy-MM-dd"),               # Joda year-of-era
        ("xxxx-'W'ww-e", "YYYY-'W'ww-e"),           # Joda weekyear → JDK Y
        ("dd/MMM/yyyy:HH:mm:ss Z", "dd/MMM/yyyy:HH:mm:ss xx"),
        ("yyyy-MM-dd'T'HH:mm:ssZZ", "yyyy-MM-dd'T'HH:mm:ssXXX"),
        ("yyyy-MM-dd HH:mm:ss ZZZ", "yyyy-MM-dd HH:mm:ss VV"),
        ("EEE MMM dd HH:mm:ss yyyy", "EEE MMM dd HH:mm:ss yyyy"),
    ],
)
def test_translate_joda_runs(joda, jdk):
    assert _translate_joda(joda) == jdk


def test_unparseable_detection():
    assert not _spark_unparseable("yyyy-MM-dd HH:mm:ss xx")
    assert _spark_unparseable("EEE MMM dd HH:mm:ss yyyy")   # day-of-week
    assert _spark_unparseable("YYYY-'W'ww-e")               # week-based
    # quoted letters never trigger the fallback
    assert not _spark_unparseable("yyyy'W'MM")


def test_strptime_translation():
    assert _joda_to_strptime("EEE MMM dd HH:mm:ss yyyy") == "%a %b %d %H:%M:%S %Y"
    assert _joda_to_strptime("xxxx-'W'ww-e") == "%G-W%V-%u"


_CASES = [
    # (value, joda_format, expected "yyyy-MM-dd HH:mm:ss" UTC)
    ("2023-10-05 10:11:12", "yyyy-MM-dd HH:mm:ss", "2023-10-05 10:11:12"),
    ("2023-10-05", "YYYY-MM-dd", "2023-10-05 00:00:00"),
    ("05/Oct/2023:10:11:12 +0200", "dd/MMM/yyyy:HH:mm:ss Z", "2023-10-05 08:11:12"),
    ("2023-10-05T10:11:12+02:00", "yyyy-MM-dd'T'HH:mm:ssZZ", "2023-10-05 08:11:12"),
    ("2023-10-05 10:11:12.123", "yyyy-MM-dd HH:mm:ss.SSS", "2023-10-05 10:11:12"),
    # Spark-unparseable formats → vectorized strptime fallback:
    ("Thu Oct 05 10:11:12 2023", "EEE MMM dd HH:mm:ss yyyy", "2023-10-05 10:11:12"),
    ("2023-W40-4", "xxxx-'W'ww-e", "2023-10-05 00:00:00"),
]


@pytest.mark.parametrize("value,fmt,expected", _CASES)
def test_date_parse_golden(spark, value, fmt, expected):
    df = spark.createDataFrame([(value,)], ["raw"])
    out = date_op(df, "raw", [fmt], target="t")
    row = out.select(
        F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("t"), "tags"
    ).collect()[0]
    assert row["t"] == expected, (value, fmt)
    assert not row["tags"]


def test_date_failure_still_tags(spark):
    df = spark.createDataFrame([("not a date",)], ["raw"])
    out = date_op(df, "raw", ["EEE MMM dd HH:mm:ss yyyy"], target="t").collect()[0]
    assert out["t"] is None
    assert "_dateparsefailure" in out["tags"]


def test_first_matching_format_wins_across_paths(spark):
    """Native and strptime-fallback formats coalesce in declaration
    order, exactly like the reference's format list."""
    df = spark.createDataFrame(
        [("2023-10-05 10:11:12",), ("Thu Oct 05 10:11:12 2023",)], ["raw"]
    )
    out = date_op(
        df, "raw", ["yyyy-MM-dd HH:mm:ss", "EEE MMM dd HH:mm:ss yyyy"], target="t"
    )
    vals = [
        r["t"] for r in out.select(
            F.date_format("t", "yyyy-MM-dd HH:mm:ss").alias("t")
        ).collect()
    ]
    assert vals == ["2023-10-05 10:11:12", "2023-10-05 10:11:12"]


def test_quoted_literal_with_spaces_stays_quoted():
    """"' at '" must not leak an unquoted 'a' (am/pm letter) into the
    JDK pattern."""
    assert _translate_joda("yyyy-MM-dd' at 'HH:mm") == "yyyy-MM-dd' at 'HH:mm"


def test_quoted_literal_parse_golden(spark):
    df = spark.createDataFrame([("2023-10-05 at 10:11",)], ["raw"])
    out = date_op(df, "raw", ["yyyy-MM-dd' at 'HH:mm"], target="t").select(
        F.date_format("t", "yyyy-MM-dd HH:mm").alias("t"), "tags"
    ).collect()[0]
    assert out["t"] == "2023-10-05 10:11" and not out["tags"]


def test_date_target_equals_field_tags_not_throws(spark):
    """Overwriting the source field in place: unparseable rows must tag
    _dateparsefailure, never ANSI-throw from the coalesce fallback."""
    df = spark.createDataFrame([("05/Oct/2023:10:11:12",), ("not-a-date",)], ["ts"])
    out = date_op(df, "ts", ["dd/MMM/yyyy:HH:mm:ss"], target="ts").collect()
    ok, bad = out
    assert ok["ts"] is not None and not ok["tags"]
    assert bad["ts"] is None and "_dateparsefailure" in bad["tags"]


def test_sprintf_joda_week_patterns(spark):
    """sprintf `%{+fmt}` routes through the full Joda translator, including
    week-based letters Spark's date_format rejects (x=weekyear, w=week,
    e=ISO dow) — `%{+xxxx.ww}` is the canonical weekly-index naming
    pattern (Event.java §sprintf). Goldens match Python isocalendar():
    2021-01-01 is ISO week 2020-W53; 2019-12-30 is 2020-W01."""
    from logstash_spark.operators.common import sprintf

    df = spark.createDataFrame(
        [("2021-01-01 10:30:45",), ("2019-12-30 23:59:59",), ("2024-07-04 00:00:01",)],
        ["raw"],
    ).withColumn("@timestamp", F.to_timestamp("raw"))
    out = df.select(
        sprintf("logs-%{+xxxx.ww}").alias("weekidx"),
        sprintf("%{+YYYY-MM-dd'T'HH:mm:ss}").alias("isoish"),
        sprintf("%{+EEE}/%{+e}").alias("dow"),
    ).collect()
    assert [r["weekidx"] for r in out] == ["logs-2020.53", "logs-2020.01", "logs-2024.27"]
    assert out[0]["isoish"] == "2021-01-01T10:30:45"
    assert [r["dow"] for r in out] == ["Fri/5", "Mon/1", "Thu/4"]

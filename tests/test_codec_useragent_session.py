"""Golden tests for multiline codec, useragent classes, sessionize."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators.aggregate import sessionize
from logstash_spark.operators.codec import multiline
from logstash_spark.operators.parse import useragent


def test_multiline_previous_joins_continuations(spark):
    rows = [
        ("f1", 1, "Exception in thread main"),
        ("f1", 2, "  at com.example.A"),
        ("f1", 3, "  at com.example.B"),
        ("f1", 4, "INFO all good"),
        ("f2", 1, "WARN standalone"),
    ]
    df = spark.createDataFrame(rows, ["source_file", "line_no", "line"])
    out = multiline(
        df, "line", r"^\s", what="previous", group_by=("source_file",), order_by="line_no"
    ).collect()
    by_key = {(r.source_file, r.event_start): r for r in out}
    assert by_key[("f1", 1)].n_lines == 3
    assert by_key[("f1", 1)].line == "Exception in thread main\n  at com.example.A\n  at com.example.B"
    assert by_key[("f1", 4)].n_lines == 1
    assert by_key[("f2", 1)].line == "WARN standalone"


def test_multiline_next_mode(spark):
    rows = [
        ("f", 1, "part1 \\"),
        ("f", 2, "part2"),
        ("f", 3, "alone"),
    ]
    df = spark.createDataFrame(rows, ["source_file", "line_no", "line"])
    out = multiline(
        df, "line", r"\\$", what="next", group_by=("source_file",), order_by="line_no"
    ).collect()
    lines = sorted((r.event_start, r.line) for r in out)
    assert lines == [(1, "part1 \\\npart2"), (3, "alone")]


def test_useragent_families(spark):
    rows = [
        (1, "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36"),
        (2, "Mozilla/5.0 (Macintosh; Mac OS X) Version/17 Safari/605.1"),
        (3, "Mozilla/5.0 (X11; Linux) Gecko/20100101 Firefox/120.0"),
        (4, "Googlebot/2.1 (+http://www.google.com/bot.html)"),
        (5, "Mozilla/5.0 (Windows NT 10.0) Edge/18.0"),
        (6, "weird client"),
    ]
    df = spark.createDataFrame(rows, ["id", "ua"])
    got = {r.id: (r.ua_name, r.ua_os) for r in useragent(df, "ua").collect()}
    assert got[1] == ("Chrome", "Windows")   # Chrome beats Safari token
    assert got[2] == ("Safari", "macOS")
    assert got[3] == ("Firefox", "Linux")
    assert got[4][0] == "bot"
    assert got[5] == ("Edge", "Windows")
    assert got[6] == ("Other", "Other")


def test_sessionize_gap_boundaries(spark):
    rows = [
        (1, "2026-01-01 00:00:00"),
        (1, "2026-01-01 00:04:00"),   # < gap: same session
        (1, "2026-01-01 00:20:00"),   # > 10 min gap: new session
        (2, "2026-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, ["uid", "ts_s"]).withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = sessionize(df, "uid", "ts", gap_seconds=600)
    sessions = {
        (r.uid, r.ts_s): r.session_id for r in out.collect()
    }
    assert sessions[(1, "2026-01-01 00:00:00")] == sessions[(1, "2026-01-01 00:04:00")]
    assert sessions[(1, "2026-01-01 00:20:00")] != sessions[(1, "2026-01-01 00:00:00")]
    assert sessions[(2, "2026-01-01 00:00:00")] == "2#1"


def test_translate_dictionary_path(spark, tmp_path):
    import json as _json

    from logstash_spark.operators.enrich import translate

    p = tmp_path / "dict.json"
    p.write_text(_json.dumps({"click": "engagement", "purchase": "revenue"}))
    df = spark.createDataFrame([("click",), ("purchase",), ("other",)], ["et"])
    out = translate(df, "et", "cat", None, dictionary_path=str(p), fallback="misc")
    got = {r["et"]: r["cat"] for r in out.collect()}
    assert got == {"click": "engagement", "purchase": "revenue", "other": "misc"}

    c = tmp_path / "dict.csv"
    c.write_text("click,engagement\npurchase,revenue\n")
    out2 = translate(df, "et", "cat", None, dictionary_path=str(c), fallback="misc")
    assert {r["et"]: r["cat"] for r in out2.collect()} == got

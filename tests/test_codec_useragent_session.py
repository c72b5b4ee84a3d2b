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


def test_multiline_max_lines_splits_and_tags(spark):
    """An 8-line never-terminated event with max_lines=3 becomes 3 events
    (3+3+2); the force-flushed chunks carry _multiline_toolong, the final
    remainder does not (reference max_lines_reached tagging)."""
    rows = [("f", i, f"  cont {i}") for i in range(1, 9)]
    rows[0] = ("f", 1, "START of event")
    df = spark.createDataFrame(rows, ["source_file", "line_no", "line"])
    out = multiline(
        df, "line", r"^\s", what="previous", group_by=("source_file",),
        order_by="line_no", max_lines=3,
    ).collect()
    by_start = {r.event_start: r for r in sorted(out, key=lambda r: r.event_start)}
    assert [by_start[k].n_lines for k in sorted(by_start)] == [3, 3, 2]
    assert by_start[1].tags == ["_multiline_toolong"]
    assert by_start[4].tags == ["_multiline_toolong"]
    assert by_start[7].tags == []


def test_multiline_max_bytes_splits(spark):
    rows = [("f", i, "x" * 10) for i in range(1, 7)]  # 60 bytes total
    rows[0] = ("f", 1, "S" + "x" * 9)
    df = spark.createDataFrame(rows, ["source_file", "line_no", "line"])
    out = multiline(
        df, "line", r"^x", what="previous", group_by=("source_file",),
        order_by="line_no", max_bytes=25,
    ).collect()
    # cum-before chunks: lines at byte offsets 0,10,20,30,40,50 → chunks
    # 0,0,0,1,1,2 → 3 events of 3/2/1 lines
    assert sorted(r.n_lines for r in out) == [1, 2, 3]
    assert sum(1 for r in out if r.tags == ["_multiline_toolong"]) == 2


def test_line_codec_overwrites_existing_target(spark):
    from logstash_spark.operators.codec import line_codec

    df = spark.createDataFrame(
        [("a\nb", "old-msg", 1)], ["blob", "message", "id"]
    )
    out = line_codec(df, "blob", target="message")
    assert out.columns.count("message") == 1
    got = sorted((r.line_no, r.message) for r in out.collect())
    assert got == [(0, "a"), (1, "b")]
    # downstream reference must not be ambiguous
    assert out.where(F.col("message") == "a").count() == 1


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

    # YAML — the format the logstash-filter-translate docs lead with;
    # non-string scalar keys/values stringify ('100: continue' matches
    # the string field value '100')
    y = tmp_path / "dict.yml"
    y.write_text('click: engagement\npurchase: revenue\n100: 42\n')
    dfy = spark.createDataFrame([("click",), ("100",), ("other",)], ["et"])
    out3 = translate(dfy, "et", "cat", None, dictionary_path=str(y), fallback="misc")
    assert {r["et"]: r["cat"] for r in out3.collect()} == {
        "click": "engagement", "100": "42", "other": "misc"
    }

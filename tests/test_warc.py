"""Unit tests for codec.warc_decode (WARC/CommonCrawl ingestion)."""

from pyspark.sql import functions as F

from logstash_spark.operators.codec import warc_decode

_RESP = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Target-URI: https://example.com/x\r\n"
    "WARC-Date: 2026-01-17T12:34:56Z\r\n"
    "WARC-Record-ID: <urn:uuid:abc>\r\n"
    "Content-Type: application/http;msgtype=response\r\n"
    "Content-Length: 55\r\n"
    "\r\n"
    "HTTP/1.1 200 OK\r\n"
    "Content-Type: text/html\r\n"
    "\r\n"
    "hello body\r\n"
    "\r\n"
)
_CONV = (
    "WARC/1.0\n"
    "WARC-Type: conversion\n"
    "WARC-Target-URI: https://example.com/y\n"
    "WARC-Date: 2026-01-17T12:34:57Z\n"
    "\n"
    "extracted text only\n"
    "\n"
)


def _decode(spark, blob):
    df = spark.createDataFrame([(1, blob)], "file_id int, blob string")
    return warc_decode(df, "blob").orderBy("record_no").collect()


def test_warc_response_and_conversion(spark):
    rows = _decode(spark, _RESP + _CONV)
    assert [r["warc_type"] for r in rows] == ["response", "conversion"]
    r0, r1 = rows
    assert r0["target_uri"] == "https://example.com/x"
    assert r0["record_id"] == "<urn:uuid:abc>"
    assert r0["content_length"] == 55
    assert r0["http_status"] == 200
    assert r0["payload"] == "hello body"
    assert r0["warc_ts"] is not None
    # LF-only record (WET-style) parses the same
    assert r1["http_status"] is None
    assert r1["payload"] == "extracted text only"
    assert r1["content_length"] is None
    assert all(r["tags"] == [] for r in rows)


def test_warc_malformed_record_tagged(spark):
    blob = _RESP + "WARC/1.0\r\nnot a header block at all"
    rows = _decode(spark, blob)
    assert rows[0]["tags"] == []
    assert rows[1]["tags"] == ["_warcparsefailure"]
    assert rows[1]["warc_type"] == ""


def test_warc_prefix_garbage_skipped(spark):
    rows = _decode(spark, "junk before the first record\n" + _RESP)
    assert len(rows) == 1 and rows[0]["warc_type"] == "response"


def test_warc_plan_zero_shuffle(spark):
    df = spark.createDataFrame([(1, _RESP)], "file_id int, blob string")
    out = warc_decode(df, "blob")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_warc_keep_field(spark):
    df = spark.createDataFrame([(1, _RESP)], "file_id int, blob string")
    out = warc_decode(df, "blob", keep_field=True)
    assert "blob" in out.columns
    assert out.count() == 1

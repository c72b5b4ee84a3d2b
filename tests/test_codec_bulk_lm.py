"""json_lines / graphite / es_bulk codecs, anonymize + true HMAC,
HAPROXYHTTPBASE grok, bigram LM scoring."""

from __future__ import annotations

import hashlib
import hmac as pyhmac

import pytest
from pyspark.sql import functions as F

from logstash_spark.functions import anonymize, fingerprint, hmac_hex
from logstash_spark.operators.codec import (
    es_bulk_decode,
    es_bulk_encode,
    graphite_decode,
    graphite_encode,
    json_lines_decode,
)
from logstash_spark.operators.dataprep import (
    bigram_logprob_score,
    bigram_vocab_logp,
    unigram_vocab_logp,
)


class TestJsonLines:
    def test_decode_and_failure_tag(self, spark):
        blob = '{"a":1,"b":"x"}\n{"a":2,"b":"y"}\nnot json\n{"a":3,"b":"z"}'
        df = spark.createDataFrame([(1, blob)], "id long, blob string")
        rows = json_lines_decode(df, "blob", "a INT, b STRING").orderBy(
            "line_no"
        ).collect()
        assert [r["a"] for r in rows] == [1, 2, None, 3]
        assert rows[2]["tags"] == ["_jsonparsefailure"]
        assert rows[2]["raw_line"] == "not json"
        assert rows[0]["tags"] == [] and rows[0]["raw_line"] is None

    def test_missing_fields_are_null_not_failure(self, spark):
        df = spark.createDataFrame([(1, '{"a":7}')], "id long, blob string")
        row = json_lines_decode(df, "blob", "a INT, b STRING").collect()[0]
        assert row["a"] == 7 and row["b"] is None and row["tags"] == []

    def test_empty_lines_skipped(self, spark):
        df = spark.createDataFrame([(1, '\n{"a":1}\n\n')], "id long, blob string")
        assert json_lines_decode(df, "blob", "a INT").count() == 1


class TestGraphite:
    def test_decode(self, spark):
        df = spark.createDataFrame(
            [(1, "servers.web1.cpu 42.5 1700000000"), (2, "bad line")],
            "id long, message string",
        )
        rows = {r["id"]: r for r in graphite_decode(df, "message").collect()}
        assert rows[1]["metric"] == "servers.web1.cpu"
        assert rows[1]["value"] == 42.5
        assert rows[1]["tags"] == []
        assert rows[2]["metric"] is None
        assert rows[2]["tags"] == ["_graphiteparsefailure"]

    def test_encode_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(1, "a.b.c 7 1700000000"), (2, "a.b.c -1.25 1700000001")],
            "id long, message string",
        )
        dec = graphite_decode(df, "message")
        enc = graphite_encode(dec).orderBy("id").collect()
        assert enc[0]["message"] == "a.b.c 7 1700000000"
        assert enc[1]["message"] == "a.b.c -1.25 1700000001"


class TestEsBulk:
    BODY = "\n".join(
        [
            '{"index":{"_index":"logs","_id":"1"}}',
            '{"f":"v1"}',
            '{"delete":{"_index":"logs","_id":"2"}}',
            '{"create":{"_index":"other","_id":"3"}}',
            '{"f":"v3"}',
        ]
    )

    def test_decode_pairs_and_delete(self, spark):
        df = spark.createDataFrame([(1, self.BODY)], "req long, body string")
        rows = es_bulk_decode(df, "body", group_by=["req"]).orderBy(
            "line_no"
        ).collect()
        assert [(r["action"], r["bulk_id"], r["source"]) for r in rows] == [
            ("index", "1", '{"f":"v1"}'),
            ("delete", "2", None),
            ("create", "3", '{"f":"v3"}'),
        ]
        assert rows[2]["bulk_index"] == "other"

    def test_encode(self, spark):
        df = spark.createDataFrame([(7, "x")], "doc_id long, f string")
        out = es_bulk_encode(
            df, index="logs", id_col="doc_id", source_cols=["f"]
        ).collect()[0]
        meta, src = out["message"].split("\n")
        assert meta == '{"index":{"_index":"logs","_id":"7"}}'
        assert src == '{"f":"x"}'

    def test_encode_delete_single_line(self, spark):
        df = spark.createDataFrame([(7, "x")], "doc_id long, f string")
        out = es_bulk_encode(
            df, index="logs", id_col="doc_id", source_cols=["f"], action="delete"
        ).collect()[0]
        assert "\n" not in out["message"]


class TestAnonymizeHmac:
    def test_digest_matches_hashlib(self, spark):
        df = spark.createDataFrame([(1, "alice")], "id long, user string")
        row = anonymize(df, "user", algorithm="SHA256").collect()[0]
        assert row["user"] == hashlib.sha256(b"alice").hexdigest()

    @pytest.mark.parametrize("method,mod", [
        ("SHA256", hashlib.sha256), ("SHA1", hashlib.sha1), ("MD5", hashlib.md5),
    ])
    def test_hmac_matches_python(self, spark, method, mod):
        df = spark.createDataFrame([(1, "hello world")], "id long, v string")
        got = df.select(hmac_hex(F.col("v"), "sekrit", method).alias("h")).collect()[0]["h"]
        assert got == pyhmac.new(b"sekrit", b"hello world", mod).hexdigest()

    def test_hmac_long_key_digested(self, spark):
        key = "k" * 100  # > 64-byte block: RFC 2104 digests the key first
        df = spark.createDataFrame([(1, "msg")], "id long, v string")
        got = df.select(hmac_hex(F.col("v"), key, "SHA256").alias("h")).collect()[0]["h"]
        assert got == pyhmac.new(key.encode(), b"msg", hashlib.sha256).hexdigest()

    def test_fingerprint_keyed_is_true_hmac(self, spark):
        df = spark.createDataFrame([(1, "payload")], "id long, v string")
        row = fingerprint(df, "v", target="fp", method="SHA256", key="k1").collect()[0]
        assert row["fp"] == pyhmac.new(b"k1", b"payload", hashlib.sha256).hexdigest()

    def test_null_stays_null(self, spark):
        df = spark.createDataFrame([(1, None)], "id long, user string")
        assert anonymize(df, "user").collect()[0]["user"] is None


class TestHaproxyGrok:
    LINE = (
        "192.168.1.10:51234 [17/Aug/2026:10:11:12.345] fe-main "
        "be-app/srv3 9/0/1/94/104 200 12345 - - ---- 10/20/30/5/0 0/0 "
        '"GET /api/v1/item/99 HTTP/1.1"'
    )

    def test_full_line(self, spark):
        from logstash_spark.operators.parse import grok

        df = spark.createDataFrame([(1, self.LINE)], "id long, message string")
        row = grok(df, "message", r"^%{HAPROXYHTTPBASE}$").collect()[0]
        assert row["client_ip"] == "192.168.1.10"
        assert row["client_port"] == 51234
        assert row["accept_date"] == "17/Aug/2026:10:11:12.345"
        assert row["backend_name"] == "be-app"
        assert row["server_name"] == "srv3"
        assert row["time_backend_response"] == 94
        assert row["http_status_code"] == 200
        assert row["termination_state"] == "----"
        assert row["actconn"] == 10
        assert row["srv_queue"] == 0
        assert row["http_verb"] == "GET"
        assert row["http_request"] == "/api/v1/item/99"
        assert row["http_version"] == "1.1"

    def test_badreq(self, spark):
        from logstash_spark.operators.parse import grok

        line = self.LINE.replace('"GET /api/v1/item/99 HTTP/1.1"', '"<BADREQ>"')
        df = spark.createDataFrame([(1, line)], "id long, message string")
        row = grok(df, "message", r"^%{HAPROXYHTTPBASE}$").collect()[0]
        assert row["http_verb"] is None
        assert row["http_status_code"] == 200


class TestBigramLm:
    def test_score_backoff_and_oov(self, spark):
        # corpus: "a b" x4 -> bigram (a,b) dominates; "c" appears as
        # unigram only; "z q" never seen
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b c"), (3, "c a b")],
            "doc_id long, text string",
        )
        bv = bigram_vocab_logp(docs, vocab_size=2)
        uv = unigram_vocab_logp(docs, vocab_size=10)
        brows = {(r["w1"], r["w2"]): r for r in bv.collect()}
        # P(b|a) = 4/4 -> logp2 = 0
        assert brows[("a", "b")]["logp2"] == 0
        scored = {
            r["doc_id"]: r
            for r in bigram_logprob_score(docs, bv, uv).collect()
        }
        # doc 1: bigrams (a,b),(b,a),(a,b); (b,a) backs off or floors
        assert scored[1]["n_bigrams"] == 3
        # every doc has >= 1 known (a,b) bigram -> finite sums
        assert all(s["logp2_sum"] <= 0 for s in scored.values())

    def test_short_doc_drops_out(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "solo")], "doc_id long, text string"
        )
        bv = bigram_vocab_logp(docs, vocab_size=4)
        uv = unigram_vocab_logp(docs, vocab_size=4)
        ids = [r["doc_id"] for r in bigram_logprob_score(docs, bv, uv).collect()]
        assert ids == [1]

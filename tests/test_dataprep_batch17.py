"""Golden tests for batch-17 operators: sentence_split, chunk_sentences
(sentence-aware RAG chunking), json_key_census."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _sents(spark, s: str):
    df = spark.createDataFrame([(s,)], "t string")
    return list(
        df.select(D.sentence_split("t").alias("s")).collect()[0]["s"]
    )


class TestSentenceSplit:
    def test_basic(self, spark):
        assert _sents(spark, "Hello world. This is two. And three!") == [
            "Hello world.", "This is two.", "And three!"
        ]

    def test_quotes_and_digits(self, spark):
        assert _sents(spark, 'He said "stop." Then left. 9 lives.') == [
            'He said "stop."', "Then left.", "9 lives."
        ]

    def test_lowercase_continuation_no_split(self, spark):
        assert _sents(spark, "Dr. smith stayed. lowercase holds. Yes.") == [
            "Dr. smith stayed. lowercase holds.", "Yes."
        ]

    def test_no_boundary(self, spark):
        assert _sents(spark, "no punctuation at all") == [
            "no punctuation at all"
        ]


class TestChunkSentences:
    def _chunks(self, spark, text, chunk_chars, overlap=0):
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return (
            D.chunk_sentences(
                df, chunk_chars=chunk_chars, overlap_sentences=overlap
            )
            .orderBy("chunk_id")
            .collect()
        )

    def test_assignment_by_cumulative_offset(self, spark):
        # sentences of 10 chars each ("Aaaa bbbb." etc); chunk_chars=25:
        # cum-before = 0,10,20,30,40 -> cids 0,0,0,1,1
        text = "Aaaa bbbb. Cccc dddd! Eeee ffff? Gggg hhhh. Iiii jjjj."
        out = self._chunks(spark, text, 25)
        assert [r.chunk_text for r in out] == [
            "Aaaa bbbb. Cccc dddd! Eeee ffff?",
            "Gggg hhhh. Iiii jjjj.",
        ]
        assert [r.n_sentences for r in out] == [3, 2]
        assert [r.n_chars for r in out] == [30, 20]

    def test_overlap_prepends_previous_tail(self, spark):
        text = "Aaaa bbbb. Cccc dddd! Eeee ffff? Gggg hhhh. Iiii jjjj."
        out = self._chunks(spark, text, 25, overlap=1)
        assert out[1].chunk_text == "Eeee ffff? Gggg hhhh. Iiii jjjj."
        # n_sentences counts OWN sentences only
        assert out[1].n_sentences == 2

    def test_overlap_clamps_to_previous_size(self, spark):
        text = "Aaaa bbbb. Cccc dddd! Eeee ffff? Gggg hhhh. Iiii jjjj."
        out = self._chunks(spark, text, 25, overlap=5)
        # previous chunk only has 3 sentences; all prepended, none lost
        assert out[1].chunk_text == (
            "Aaaa bbbb. Cccc dddd! Eeee ffff? Gggg hhhh. Iiii jjjj."
        )

    def test_single_chunk_and_empty(self, spark):
        out = self._chunks(spark, "One short text", 1000)
        assert len(out) == 1 and out[0].chunk_text == "One short text"
        out = self._chunks(spark, "", 10)
        assert len(out) == 1 and out[0].chunk_text == ""

    def test_bad_chunk_chars_raises(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            D.chunk_sentences(df, chunk_chars=0)


class TestJsonKeyCensus:
    def test_coverage_with_corrupt_rows(self, spark):
        rows = [
            ('{"a":1,"b":2}',),
            ('{"a":3}',),
            ("not json",),
            ('{"a":4,"c":5}',),
        ]
        df = spark.createDataFrame(rows, "message string")
        got = {r.key: r for r in D.json_key_census(df).collect()}
        assert got["a"].n_docs_with_key == 3
        # denominator includes the corrupt row: 3/4
        assert got["a"].coverage_ppm == 750000
        assert got["b"].coverage_ppm == 250000
        assert set(got) == {"a", "b", "c"}

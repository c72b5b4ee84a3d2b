"""Golden tests for batch-21: char_span_to_token_span (annotation
bridge)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _span(spark, text: str, s: int, e: int):
    df = spark.createDataFrame([(text,)], "t string")
    feats = D.char_span_to_token_span(F.col("t"), F.lit(s), F.lit(e))
    return df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]


class TestCharSpanToTokenSpan:
    # "alpha beta gamma" offsets: alpha 0-5, beta 6-10, gamma 11-16
    def test_exact_single_token(self, spark):
        r = _span(spark, "alpha beta gamma", 6, 10)
        assert (r.tok_start, r.tok_end) == (1, 2)

    def test_multi_token_overlap(self, spark):
        r = _span(spark, "alpha beta gamma", 3, 12)
        assert (r.tok_start, r.tok_end) == (0, 3)

    def test_partial_char_inside_token(self, spark):
        r = _span(spark, "alpha beta gamma", 7, 8)
        assert (r.tok_start, r.tok_end) == (1, 2)

    def test_span_on_separator_only(self, spark):
        # [5, 6) is exactly the space between alpha and beta
        r = _span(spark, "alpha beta gamma", 5, 6)
        assert (r.tok_start, r.tok_end) == (0, 0)

    def test_empty_and_out_of_range(self, spark):
        assert tuple(_span(spark, "alpha", 2, 2))[:2] == (0, 0)
        assert tuple(_span(spark, "alpha", 50, 60))[:2] == (0, 0)

    def test_whole_text(self, spark):
        r = _span(spark, "a bb ccc", 0, 8)
        assert (r.tok_start, r.tok_end, r.n_tokens) == (0, 3, 3)

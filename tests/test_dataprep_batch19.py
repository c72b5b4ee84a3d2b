"""Golden tests for batch-19 operators: special_token_scrub
(tokenizer-injection guard) and dedup_key_text (canonical dedup key)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _scrub(spark, s: str, mode: str = "strip", tokens=None):
    df = spark.createDataFrame([(s,)], "t string")
    kw = {"mode": mode}
    if tokens is not None:
        kw["tokens"] = tokens
    feats = D.special_token_scrub(F.col("t"), **kw)
    return df.select(
        feats["scrubbed"].alias("s"), feats["n_special"].alias("n")
    ).collect()[0]


class TestSpecialTokenScrub:
    def test_strip_and_count(self, spark):
        r = _scrub(spark, "a<|im_end|>b</s>c<|im_end|>d")
        assert r.s == "abcd"
        assert r.n == 3

    def test_break_mode_keeps_readable(self, spark):
        r = _scrub(spark, "x<|endoftext|>y", mode="break")
        assert r.s == "x< |endoftext|>y"
        assert r.n == 1

    def test_clean_text_untouched(self, spark):
        r = _scrub(spark, "perfectly normal text < 5 and |pipe|")
        assert r.s == "perfectly normal text < 5 and |pipe|"
        assert r.n == 0

    def test_forged_nested_sequence_also_dies(self, spark):
        # stripping the inner token forges an outer one; the sequential
        # chain catches it — the guard errs toward removal
        r = _scrub(
            spark, "<<|im_start|>s>", tokens=("<|im_start|>", "<s>")
        )
        assert r.s == ""

    def test_bad_mode_raises(self, spark):
        with pytest.raises(ValueError):
            D.special_token_scrub(F.col("t"), mode="nope")


class TestDedupKeyText:
    def _key(self, spark, s: str) -> str:
        df = spark.createDataFrame([(s,)], "t string")
        return df.select(D.dedup_key_text(F.col("t")).alias("k")).collect()[
            0
        ]["k"]

    def test_variants_collapse(self, spark):
        variants = [
            "Hello, World!",
            "  hello   world  ",
            "HELLO WORLD???",
            "hello; world.",
            "hello\tworld\n",
        ]
        keys = {self._key(spark, v) for v in variants}
        assert keys == {"hello world"}

    def test_digits_kept(self, spark):
        assert self._key(spark, "Route 66!") == "route 66"

    def test_distinct_texts_distinct_keys(self, spark):
        assert self._key(spark, "alpha beta") != self._key(spark, "alpha gamma")

    def test_null_and_symbol_only(self, spark):
        df = spark.createDataFrame([(None,), ("!!!",)], "t string")
        got = [r["k"] for r in df.select(D.dedup_key_text(F.col("t")).alias("k")).collect()]
        assert got == ["", ""]

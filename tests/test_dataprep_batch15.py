"""Golden tests for batch-15 operators: char_entropy_features (quantized
Shannon entropy), ngram_overlap_features (set ROUGE-N in basis points),
chat_render (chat-template serialization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _ent(spark, s: str, max_chars: int = 512):
    df = spark.createDataFrame([(s,)], "t string")
    feats = D.char_entropy_features(F.col("t"), max_chars=max_chars)
    return df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]


class TestCharEntropy:
    def test_uniform_repeat_is_zero(self, spark):
        r = _ent(spark, "aaaa")
        assert (r.n_sampled, r.n_distinct_chars, r.entropy_q, r.entropy_cb) == (
            4, 1, 0, 0
        )

    def test_all_distinct(self, spark):
        # n=4, each count 1: surprise floor(log2(4)) = 2 per char
        r = _ent(spark, "abcd")
        assert (r.entropy_q, r.entropy_cb) == (8, 200)

    def test_mixed_hand_computed(self, spark):
        # "aab": a count 2 -> floor(log2(3 div 2)) = 0; b -> floor(log2(3)) = 1
        r = _ent(spark, "aab")
        assert (r.n_distinct_chars, r.entropy_q, r.entropy_cb) == (2, 1, 33)

    def test_empty_and_null(self, spark):
        r = _ent(spark, "")
        assert (r.n_sampled, r.n_distinct_chars, r.entropy_q, r.entropy_cb) == (
            0, 0, 0, 0
        )

    def test_prefix_cap(self, spark):
        r = _ent(spark, "ab" * 100, max_chars=6)
        assert r.n_sampled == 6
        # "ababab": each of a,b count 3, n=6 -> floor(log2(2)) = 1 each
        assert r.entropy_q == 6

    def test_spam_scores_below_prose(self, spark):
        spam = _ent(spark, "zzzzzzzzzzzzzzzzzzzz")
        prose = _ent(spark, "the quick brown fox jumps")
        assert spam.entropy_cb < prose.entropy_cb


def _ovl(spark, a: str, b: str, n: int = 2):
    df = spark.createDataFrame([(a, b)], "a string, b string")
    feats = D.ngram_overlap_features(F.col("a"), F.col("b"), n=n)
    return df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]


class TestNgramOverlap:
    def test_partial_overlap(self, spark):
        r = _ovl(spark, "a b c d", "a b c x")
        # grams: {ab,bc,cd} vs {ab,bc,cx}, inter 2
        assert (r.n_grams_a, r.n_grams_b, r.n_overlap) == (3, 3, 2)
        assert r.precision_bp == r.recall_bp == 6666
        assert r.f1_bp == 6666

    def test_identical(self, spark):
        r = _ovl(spark, "x y z", "x y z")
        assert (r.precision_bp, r.recall_bp, r.f1_bp) == (10000, 10000, 10000)

    def test_disjoint(self, spark):
        r = _ovl(spark, "a b c", "x y z")
        assert (r.n_overlap, r.f1_bp) == (0, 0)

    def test_too_short_side_is_empty(self, spark):
        r = _ovl(spark, "single", "a b c")
        assert (r.n_grams_a, r.precision_bp, r.recall_bp, r.f1_bp) == (
            0, 0, 0, 0
        )

    def test_duplicate_grams_counted_once(self, spark):
        r = _ovl(spark, "a b a b a", "a b")
        # distinct grams of a: {ab, ba}; of b: {ab}
        assert (r.n_grams_a, r.n_grams_b, r.n_overlap) == (2, 1, 1)
        assert (r.precision_bp, r.recall_bp) == (5000, 10000)

    def test_trigram_mode(self, spark):
        r = _ovl(spark, "a b c d", "b c d e", n=3)
        # {abc,bcd} vs {bcd,cde}
        assert (r.n_grams_a, r.n_overlap) == (2, 1)


class TestChatRender:
    def _msgs(self, spark):
        return spark.createDataFrame(
            [(1, [("user", "hi"), ("assistant", "hello")]), (2, None), (3, [])],
            "id long, m array<struct<role:string, content:string>>",
        )

    def test_chatml_golden(self, spark):
        out = {
            r.id: r.s
            for r in self._msgs(spark)
            .select("id", D.chat_render(F.col("m")).alias("s"))
            .collect()
        }
        assert out[1] == (
            "<|im_start|>user\nhi<|im_end|>\n"
            "<|im_start|>assistant\nhello<|im_end|>\n"
        )
        assert out[2] == ""
        assert out[3] == ""

    def test_generation_prompt(self, spark):
        out = (
            self._msgs(spark)
            .where("id = 1")
            .select(
                D.chat_render(
                    F.col("m"), template="chatml", add_generation_prompt=True
                ).alias("s")
            )
            .collect()[0]
            .s
        )
        assert out.endswith("<|im_start|>assistant\n")

    def test_colon_golden(self, spark):
        out = (
            self._msgs(spark)
            .where("id = 1")
            .select(D.chat_render(F.col("m"), template="colon").alias("s"))
            .collect()[0]
            .s
        )
        assert out == "user: hi\nassistant: hello\n"

    def test_unknown_template_raises(self, spark):
        import pytest

        with pytest.raises(ValueError):
            D.chat_render(F.col("m"), template="nope")

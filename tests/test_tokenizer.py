"""BPE tokenizer: training goldens (deterministic tie-breaks), greedy
cascading-encode goldens the SQL oracle cannot express, word-boundary
and null handling, and the train→encode round-trip property."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators.tokenizer import _bpe_word, bpe_encode, bpe_train


def _corpus(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "id long, text string")


class TestTrain:
    def test_hand_computed_merges(self, spark):
        # one word 'aaab' x3: (a,a) wins with 6, then the (a,b)/(aa,a)
        # tie at 3 breaks lexicographically to (a,b), then (aa,ab).
        df = _corpus(spark, ["aaab aaab", "aaab"])
        assert bpe_train(df, "text", num_merges=10) == [
            ("a", "a"),
            ("a", "b"),
            ("aa", "ab"),
        ]

    def test_stops_below_count_two(self, spark):
        # every pair occurs once -> nothing merits a merge
        df = _corpus(spark, ["abc def"])
        merges = bpe_train(df, "text", num_merges=10)
        # (each pair count==1 after no repeats) — at most the first merge
        # could tie at 1 which is rejected by the <2 floor
        assert merges == []

    def test_deterministic_across_calls(self, spark):
        df = _corpus(
            spark,
            ["low low low lower lower", "newest newest newest widest widest"],
        )
        m1 = bpe_train(df, "text", num_merges=8)
        m2 = bpe_train(df, "text", num_merges=8)
        assert m1 == m2 and len(m1) == 8


class TestEncode:
    def test_cascading_merges_golden(self, spark):
        merges = [("a", "a"), ("a", "b"), ("aa", "ab")]
        df = _corpus(spark, ["aaab aab ba"])
        out = bpe_encode(df, "text", merges, word_sep="_")
        assert out.first()["bpe_tokens"] == ["aaab", "_", "aa", "b", "_", "b", "a"]

    def test_rank_order_beats_position(self, spark):
        # 'abc': (b,c) outranks (a,b) so it merges first -> a,bc
        df = _corpus(spark, ["abc"])
        out = bpe_encode(df, "text", [("b", "c"), ("a", "b")])
        assert out.first()["bpe_tokens"] == ["a", "bc"]

    def test_no_word_sep(self, spark):
        df = _corpus(spark, ["ab ab"])
        out = bpe_encode(df, "text", [("a", "b")], word_sep=None)
        assert out.first()["bpe_tokens"] == ["ab", "ab"]

    def test_null_and_empty(self, spark):
        df = spark.createDataFrame([(1, None), (2, "   ")], "id long, text string")
        got = {r["id"]: r["bpe_tokens"] for r in bpe_encode(df, "text", []).collect()}
        assert got[1] == [] and got[2] == []

    def test_memo_returns_same_tokens(self):
        ranks = {("a", "b"): 0}
        memo: dict = {}
        first = _bpe_word("abab", ranks, memo)
        assert first == ("ab", "ab") and memo["abab"] == first
        assert _bpe_word("abab", ranks, memo) is first

    def test_roundtrip_property(self, spark):
        df = _corpus(spark, ["the quick brown fox", "jumps over the lazy dog"])
        merges = bpe_train(df, "text", num_merges=6)
        out = bpe_encode(df, "text", merges, word_sep=None).collect()
        for r in out:
            assert "".join(r["bpe_tokens"]) == r["text"].replace(" ", "")


class TestBpeDecode:
    def test_decode_inverts_encode(self, spark):
        from logstash_spark.operators.tokenizer import bpe_decode

        df = _corpus(spark, ["the quick brown fox", "thick   thin", "", None])
        merges = bpe_train(df, "text", num_merges=4)
        enc = bpe_encode(df, "text", merges)  # default '▁' boundary
        dec = {r["id"]: r["text_decoded"]
               for r in bpe_decode(enc, "bpe_tokens").collect()}
        # whitespace runs normalize to single spaces; null/empty → ''
        assert dec[0] == "the quick brown fox"
        assert dec[1] == "thick thin"
        assert dec[2] == "" and dec[3] == ""

    def test_decode_no_sep_concatenates(self, spark):
        from logstash_spark.operators.tokenizer import bpe_decode

        df = _corpus(spark, ["ab cd"])
        enc = bpe_encode(df, "text", [("a", "b")], word_sep=None)
        got = bpe_decode(enc, "bpe_tokens", word_sep=None).head()
        assert got["text_decoded"] == "abcd"

    def test_decode_zero_shuffle(self, spark):
        from logstash_spark.operators.tokenizer import bpe_decode

        df = spark.createDataFrame(
            [(["ab", "▁", "cd"],)], "bpe_tokens array<string>"
        )
        out = bpe_decode(df, "bpe_tokens")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "ArrowEvalPython" not in plan
        assert out.head()["text_decoded"] == "ab cd"


class TestSeparatorSafety:
    def test_default_sep_survives_underscores(self, spark):
        from logstash_spark.operators.tokenizer import bpe_decode

        df = _corpus(spark, ["snake_case word"])
        enc = bpe_encode(df, "text", [("a", "b")])  # default '▁'
        got = bpe_decode(enc, "bpe_tokens").head()["text_decoded"]
        assert got == "snake_case word"  # literal '_' preserved

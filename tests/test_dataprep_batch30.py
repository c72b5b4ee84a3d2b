"""Golden tests for batch-30: grpo_advantage and eval_text_match."""

from __future__ import annotations

import math

from logstash_spark.operators import dataprep as D


class TestGrpoAdvantage:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "group_id long, sid long, reward long")
        out = D.grpo_advantage(df)
        return {(r.group_id, r.sid): r for r in out.collect()}

    def test_hand_computed(self, spark):
        # group 0: rewards [1,2,3] -> n=3 S=6 Q=14 disc=3*14-36=6
        got = self._run(spark, [(0, 0, 1), (0, 1, 2), (0, 2, 3)])
        sq6 = math.sqrt(6.0)
        assert got[(0, 2)].adv_mean_ppm == 1_000_000
        assert got[(0, 2)].adv_z_ppm == math.floor(3e6 / sq6)
        assert got[(0, 0)].adv_mean_ppm == -1_000_000
        assert got[(0, 0)].adv_z_ppm == math.floor(-3e6 / sq6)
        assert got[(0, 1)].adv_mean_ppm == 0
        assert got[(0, 1)].adv_z_ppm == 0
        assert got[(0, 0)].n == 3

    def test_constant_group_degenerates_to_zero(self, spark):
        got = self._run(spark, [(1, 0, 5), (1, 1, 5), (1, 2, 5)])
        for r in got.values():
            assert r.adv_mean_ppm == 0
            assert r.adv_z_ppm == 0

    def test_negative_floor_semantics(self, spark):
        # group [0, 1]: mean 0.5; r=0 -> (0*2-1)*1e6/2 = -5e5 exactly
        got = self._run(spark, [(2, 0, 0), (2, 1, 1)])
        assert got[(2, 0)].adv_mean_ppm == -500_000
        assert got[(2, 1)].adv_mean_ppm == 500_000


class TestEvalTextMatch:
    def _run(self, spark, pred, ref):
        df = spark.createDataFrame([(pred, ref)], "pred string, ref string")
        return D.eval_text_match(df).collect()[0]

    def test_article_normalization_gives_exact_match(self, spark):
        r = self._run(spark, "The quick brown fox!", "quick, brown fox")
        assert r.exact_match == 1
        assert r.lev_sim_ppm == 1_000_000
        assert r.token_f1_ppm == 1_000_000

    def test_insertion_hand_computed(self, spark):
        r = self._run(spark, "hello world", "hello there world")
        assert r.exact_match == 0
        # lev("hello world","hello there world") = 6; maxlen 17
        assert r.lev_sim_ppm == (17 - 6) * 1_000_000 // 17
        # overlap 2 of (2+3) tokens
        assert r.token_f1_ppm == 4_000_000 // 5

    def test_duplicate_tokens_multiset_overlap(self, spark):
        r = self._run(spark, "x x y", "x y y")
        # overlap = min(2,1) + min(1,2) = 2; F1 = 2*2/6
        assert r.token_f1_ppm == 666_666

    def test_both_empty(self, spark):
        r = self._run(spark, "", "")
        assert r.exact_match == 1
        assert r.lev_sim_ppm == 1_000_000
        assert r.token_f1_ppm == 1_000_000

    def test_articles_only_vs_word(self, spark):
        r = self._run(spark, "a the an", "xyz")
        assert r.exact_match == 0
        assert r.lev_sim_ppm == 0
        assert r.token_f1_ppm == 0

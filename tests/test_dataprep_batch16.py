"""Golden tests for batch-16 operators: pass_at_k (HumanEval unbiased
estimator), majority_vote (self-consistency), win_rate_matrix."""

from __future__ import annotations

import pytest

from logstash_spark.operators import dataprep as D


class TestPassAtK:
    def _run(self, spark, rows, ks):
        df = spark.createDataFrame(rows, "problem_id long, correct boolean")
        out = D.pass_at_k(df, ks=ks).collect()
        return {(r.problem_id, r.k): r for r in out}

    def test_hand_computed(self, spark):
        rows = [(1, c) for c in (True, True, False, False)]
        got = self._run(spark, rows, ks=(1, 2, 4))
        # n=4, c=2: pass@1 = 1 - 2/4; pass@2 = 1 - C(2,2)/C(4,2) = 5/6
        assert got[(1, 1)].pass_ppm == 500000
        assert got[(1, 2)].pass_ppm == 833334  # 1e6 - (1e6*2) div 12
        assert got[(1, 4)].pass_ppm == 1000000
        assert (got[(1, 1)].n_samples, got[(1, 1)].n_correct) == (4, 2)

    def test_all_wrong_and_all_right(self, spark):
        rows = [(1, False)] * 3 + [(2, True)] * 3
        got = self._run(spark, rows, ks=(1, 2))
        assert got[(1, 1)].pass_ppm == 0
        assert got[(1, 2)].pass_ppm == 0
        assert got[(2, 1)].pass_ppm == 1000000

    def test_k_exceeding_n_clamps(self, spark):
        rows = [(1, True), (1, False)]
        got = self._run(spark, rows, ks=(8,))
        # kk = 2: pass@2 with c=1 -> 1 - 0 = 1
        assert got[(1, 8)].pass_ppm == 1000000

    def test_bad_k_raises(self, spark):
        df = spark.createDataFrame([(1, True)], "problem_id long, correct boolean")
        with pytest.raises(ValueError):
            D.pass_at_k(df, ks=())
        with pytest.raises(ValueError):
            D.pass_at_k(df, ks=(0,))


class TestMajorityVote:
    def test_plurality_and_tie_break(self, spark):
        rows = (
            [(1, "a")] * 3 + [(1, "b")] * 3 + [(1, "c")] * 2 + [(2, "z")]
        )
        df = spark.createDataFrame(rows, "prompt_id long, answer string")
        got = {r.prompt_id: r for r in D.majority_vote(df).collect()}
        assert got[1].majority_answer == "a"  # ties break answer ASC
        assert got[1].majority_votes == 3
        assert got[1].n_votes == 8
        assert got[1].n_distinct_answers == 3
        assert got[1].share_ppm == 375000
        assert got[2].majority_answer == "z"
        assert got[2].share_ppm == 1000000


class TestWinRateMatrix:
    def test_canonicalization_and_half_wins(self, spark):
        rows = [
            ("m1", "m2", "a"),
            ("m2", "m1", "a"),  # reversed order, same pair
            ("m1", "m2", "tie"),
            ("m1", "m2", "b"),
        ]
        df = spark.createDataFrame(rows, "model_a string, model_b string, winner string")
        out = D.win_rate_matrix(df).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.model_lo, r.model_hi) == ("m1", "m2")
        assert (r.wins_lo, r.wins_hi, r.ties, r.games) == (1, 2, 1, 4)
        assert r.lo_win_ppm == 375000  # (2*1 + 1) * 1e6 div 8

    def test_multiple_pairs(self, spark):
        rows = [("x", "y", "a"), ("y", "z", "b"), ("x", "z", "tie")]
        df = spark.createDataFrame(rows, "model_a string, model_b string, winner string")
        got = {(r.model_lo, r.model_hi): r for r in D.win_rate_matrix(df).collect()}
        assert got[("x", "y")].lo_win_ppm == 1000000
        assert got[("y", "z")].wins_hi == 1
        assert got[("x", "z")].lo_win_ppm == 500000

"""Golden tests for batch-32: in-cluster Naive-Bayes train + classify."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D

_TRAIN = [
    (1, "buy gold buy now", "spam"),
    (2, "buy pills now", "spam"),
    (3, "meeting notes attached", "ham"),
    (4, "lunch meeting tomorrow", "ham"),
    (5, "notes from the meeting", "ham"),
]


def _lq(k: int) -> int:
    return math.floor(math.log(k) * 1_000_000)


def _py_score(tokens, label, tc, cs, vocab_size, n_total):
    n_docs, n_toks = cs[label]
    s = _lq(n_docs) - _lq(n_total)
    for t in tokens:
        s += _lq(tc.get((label, t), 0) + 1)
    s -= len(tokens) * _lq(n_toks + vocab_size)
    return s


class TestNaiveBayes:
    def _model(self, spark):
        df = spark.createDataFrame(_TRAIN, "doc_id long, text string, label string")
        return D.nb_train(df)

    def test_train_counts(self, spark):
        tc, cs, v = self._model(spark)
        counts = {(r.label, r.token): r.cnt for r in tc.collect()}
        assert counts[("spam", "buy")] == 3
        assert counts[("ham", "meeting")] == 3
        assert ("ham", "buy") not in counts
        stats = {r.label: (r.n_docs, r.n_tokens) for r in cs.collect()}
        assert stats["spam"] == (2, 7)
        assert stats["ham"] == (3, 10)
        assert v.collect()[0].vocab_size == 11  # distinct tokens across classes

    def test_classify_matches_python_rederivation(self, spark):
        tc, cs, v = self._model(spark)
        test = spark.createDataFrame(
            [(10, "buy gold now"), (11, "meeting notes"), (12, "unseen words only")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r
            for r in D.nb_classify(test, tc, cs, v, ["ham", "spam"]).collect()
        }
        counts = {(r.label, r.token): r.cnt for r in tc.collect()}
        stats = {r.label: (r.n_docs, r.n_tokens) for r in cs.collect()}
        vs = v.collect()[0].vocab_size
        for doc_id, text in [(10, "buy gold now"), (11, "meeting notes"), (12, "unseen words only")]:
            toks = text.split()
            for lbl in ("ham", "spam"):
                exp = _py_score(toks, lbl, counts, stats, vs, 5)
                assert got[doc_id][f"nb_score_{lbl}_q"] == exp, (doc_id, lbl)
        assert got[10].nb_label == "spam"
        assert got[11].nb_label == "ham"
        # all-unseen doc: every token term is L(1)=0 for both classes, so
        # the decision reduces to prior + length penalty; ham has both the
        # larger prior and (here) the larger denominator — verify against
        # the exact scores rather than intuition.
        r12 = got[12]
        exp_label = "ham" if r12.nb_score_ham_q >= r12.nb_score_spam_q else "spam"
        assert r12.nb_label == exp_label

    def test_tie_breaks_to_smallest_label(self, spark):
        # perfectly symmetric corpus -> identical scores for both labels
        df = spark.createDataFrame(
            [(1, "x y", "a"), (2, "x y", "b")],
            "doc_id long, text string, label string",
        )
        tc, cs, v = D.nb_train(df)
        test = spark.createDataFrame([(9, "x")], "doc_id long, text string")
        r = D.nb_classify(test, tc, cs, v, ["b", "a"]).collect()[0]
        assert r.nb_score_a_q == r.nb_score_b_q
        assert r.nb_label == "a"

    def test_empty_text_scores_prior_only(self, spark):
        tc, cs, v = self._model(spark)
        test = spark.createDataFrame([(7, "")], "doc_id long, text string")
        r = D.nb_classify(test, tc, cs, v, ["ham", "spam"]).collect()[0]
        assert r.n_tok == 0
        # prior-only: L(n_docs) - L(N)
        assert r.nb_score_ham_q == _lq(3) - _lq(5)
        assert r.nb_score_spam_q == _lq(2) - _lq(5)
        assert r.nb_label == "ham"

    def test_classify_plan_has_single_corpus_shuffle(self, spark):
        tc, cs, v = self._model(spark)
        test = spark.createDataFrame(
            [(i, "buy gold") for i in range(50)], "doc_id long, text string"
        )
        plan = D.nb_classify(test, tc, cs, v, ["ham", "spam"])._jdf.queryExecution().executedPlan().toString()
        # the model join must be broadcast, not a shuffle join
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestCalibrationReport:
    def test_hand_computed_two_bins(self, spark):
        # bin 0: conf .05 .09 (ppm 50000, 90000), labels 0, 1
        # bin 9: conf 1.0 (ppm 1000000) folded into top bin, label 1
        rows = [(50_000, 0), (90_000, 1), (1_000_000, 1)]
        df = spark.createDataFrame(rows, "conf_ppm long, label long")
        got = {r.bin: r for r in D.calibration_report(df, n_bins=10).collect()}
        assert set(got) == {0, 9}
        b0, b9 = got[0], got[9]
        assert (b0.n, b0.acc_ppm, b0.avg_conf_ppm) == (2, 500_000, 70_000)
        assert b0.gap_ppm == (1_000_000 - 140_000) // 2
        assert (b9.n, b9.acc_ppm, b9.avg_conf_ppm, b9.gap_ppm) == (
            1, 1_000_000, 1_000_000, 0,
        )
        # ECE = (|1e6·1 - 140000| + 0) / 3
        assert b0.ece_ppm == 860_000 // 3 == b9.ece_ppm
        # Brier = (50000² + 910000² + 0²) / (3·1e6)
        assert b0.brier_ppm == (50_000**2 + 910_000**2) // 3_000_000

    def test_perfectly_calibrated_sharp_model(self, spark):
        rows = [(0, 0)] * 5 + [(1_000_000, 1)] * 5
        df = spark.createDataFrame(rows, "conf_ppm long, label long")
        out = D.calibration_report(df).collect()
        assert all(r.gap_ppm == 0 for r in out)
        assert all(r.ece_ppm == 0 and r.brier_ppm == 0 for r in out)

    def test_single_shuffle_plan(self, spark):
        df = spark.range(1000).select(
            (F.col("id") * 997 % 1_000_001).alias("conf_ppm"),
            (F.col("id") % 2).alias("label"),
        )
        plan = D.calibration_report(df)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def _py_lcs(a, b):
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(max(prev[j], cur[j - 1], prev[j - 1] + 1 if x == y else 0))
        prev = cur
    return prev[-1]


class TestRougeL:
    def _run(self, spark, pairs):
        df = spark.createDataFrame(
            [(i, p, r) for i, (p, r) in enumerate(pairs)],
            "doc_id long, pred_toks array<string>, ref_toks array<string>",
        )
        return {r.doc_id: r for r in D.rouge_l(df).collect()}

    def test_matches_python_dp_including_duplicates(self, spark):
        pairs = [
            ("a b a b".split(), "b a b a".split()),      # dup-heavy, LCS=3
            ("a b c d".split(), "d c b a".split()),      # reversal, LCS=1
            ("x y z".split(), "x y z".split()),          # identical
            ("p q".split(), "a p b q c".split()),        # gapped, LCS=2
            ("m".split(), "n".split()),                  # disjoint
        ]
        got = self._run(spark, pairs)
        for i, (p, r) in enumerate(pairs):
            assert got[i].lcs == _py_lcs(p, r), (p, r)
        assert got[0].lcs == 3 and got[1].lcs == 1

    def test_metrics_and_empties(self, spark):
        got = self._run(
            spark,
            [
                ("a b".split(), "a b c d".split()),
                ([], "a b".split()),
                ("a b".split(), []),
            ],
        )
        r0 = got[0]
        assert (r0.lcs, r0.np, r0.nr) == (2, 2, 4)
        assert r0.rouge_l_p_ppm == 1_000_000
        assert r0.rouge_l_r_ppm == 500_000
        assert r0.rouge_l_f_ppm == 2 * 2 * 1_000_000 // 6
        assert (got[1].lcs, got[1].rouge_l_f_ppm) == (0, 0)
        assert (got[2].lcs, got[2].rouge_l_f_ppm) == (0, 0)

    def test_zero_shuffle_plan(self, spark):
        df = spark.createDataFrame(
            [(1, ["a"], ["a"])],
            "doc_id long, pred_toks array<string>, ref_toks array<string>",
        )
        plan = D.rouge_l(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestMadOutliers:
    def test_hand_computed_lower_median_and_flags(self, spark):
        # group g: values 10,12,14,16,1000 -> med=14 (rank (5+1)//2=3)
        # abs_dev: 4,2,0,2,986 -> mad=2; outlier iff dev > 6
        rows = [(i, "g", v) for i, v in enumerate([10, 12, 14, 16, 1000])]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = {r.doc_id: r for r in D.mad_outliers(df).collect()}
        assert all(r.med == 14 and r.mad == 2 for r in got.values())
        assert [got[i].is_outlier for i in range(5)] == [
            False, False, False, False, True,
        ]

    def test_even_count_takes_lower_median(self, spark):
        rows = [(i, "g", v) for i, v in enumerate([1, 2, 3, 4])]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = D.mad_outliers(df).collect()
        assert all(r.med == 2 for r in out)  # lower median, rank (4+1)//2 = 2

    def test_groups_independent(self, spark):
        rows = [(1, "a", 5), (2, "a", 5), (3, "b", 100), (4, "b", 100)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = {r.doc_id: r for r in D.mad_outliers(df).collect()}
        assert got[1].med == 5 and got[3].med == 100
        assert all(not r.is_outlier for r in got.values())  # mad=0, dev=0

    def test_grid_topology_broadcasts_stats(self, spark):
        df = spark.createDataFrame(
            [(i, f"s{i%3}", i % 17) for i in range(200)],
            "doc_id long, source string, n_chars long",
        )
        plan = D.mad_outliers(df)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestGaleChurchAlign:
    def _run(self, spark, pairs, **kw):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "doc_id long, src_lens array<long>, tgt_lens array<long>",
        )
        return {r.doc_id: r for r in D.gale_church_align(df, **kw).collect()}

    def test_identity_merge_split(self, spark):
        got = self._run(
            spark,
            [
                ([20, 33, 26, 39], [20, 33, 26, 39]),   # identity
                ([20, 33, 26, 39], [20, 59, 39]),        # merge (1,2)
                ([20, 33, 26, 39], [20, 16, 17, 26, 39]),  # split 1
            ],
            gap_penalty=50,
            merge_penalty=5,
        )
        ident = got[0]
        assert ident.align_cost == 0
        assert [tuple(o) for o in ident.alignment] == [
            ("11", 0, 0), ("11", 1, 1), ("11", 2, 2), ("11", 3, 3),
        ]
        merged = got[1]
        assert merged.align_cost == 5
        assert [tuple(o) for o in merged.alignment] == [
            ("11", 0, 0), ("21", 1, 1), ("11", 3, 2),
        ]
        split = got[2]
        assert split.align_cost == 5
        assert [tuple(o) for o in split.alignment] == [
            ("11", 0, 0), ("12", 1, 1), ("11", 2, 3), ("11", 3, 4),
        ]

    def test_deletion_insertion_and_empty_sides(self, spark):
        got = self._run(
            spark,
            [
                ([20, 9, 33], [20, 33]),    # 9 deleted: cost 12 beats merge (14)
                ([20, 33], [20, 7, 33]),    # 7 inserted
                ([], [7]),
                ([5], []),
                ([], []),
            ],
            gap_penalty=3,
            merge_penalty=5,
        )
        assert [tuple(o) for o in got[0].alignment] == [
            ("11", 0, 0), ("10", 1, 1), ("11", 2, 1),
        ]
        assert got[0].align_cost == 9 + 3
        assert [tuple(o) for o in got[1].alignment] == [
            ("11", 0, 0), ("01", 1, 1), ("11", 1, 2),
        ]
        assert got[1].align_cost == 7 + 3
        assert [tuple(o) for o in got[2].alignment] == [("01", 0, 0)]
        assert [tuple(o) for o in got[3].alignment] == [("10", 0, 0)]
        assert got[4].alignment == [] and got[4].align_cost == 0

    def test_two_two_block(self, spark):
        # src (10, 30) vs tgt (25, 15): any 1-1 chain costs 15+15=30;
        # the 2-2 block costs |40-40| + 2*merge = 10
        got = self._run(spark, [([10, 30], [25, 15])], gap_penalty=50, merge_penalty=5)
        assert [tuple(o) for o in got[0].alignment] == [("22", 0, 0)]
        assert got[0].align_cost == 10


class TestWeightedSampleK:
    def test_exact_k_per_group_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, f"g{i % 4}", 1 + i % 7) for i in range(400)],
            "doc_id long, source string, n_chars long",
        )
        out1 = D.weighted_sample_k(df, 5, weight_col="n_chars").collect()
        out2 = D.weighted_sample_k(df, 5, weight_col="n_chars").collect()
        assert len(out1) == 20
        assert sorted(r.doc_id for r in out1) == sorted(r.doc_id for r in out2)
        per_group = {}
        for r in out1:
            per_group.setdefault(r.source, []).append(r.sample_rank)
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_group.values())

    def test_weight_bias(self, spark):
        # 100 light rows (w=1) + 100 heavy rows (w=1000): the heavy half
        # should dominate a k=20 sample by a wide, deterministic margin.
        rows = [(i, "g", 1) for i in range(100)] + [
            (i, "g", 1000) for i in range(100, 200)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        picked = D.weighted_sample_k(df, 20, weight_col="n_chars").collect()
        heavy = sum(1 for r in picked if r.doc_id >= 100)
        assert heavy >= 17  # E[heavy] ≈ 20·(1 − ~tiny); hash-fixed, not flaky

    def test_null_and_zero_weights_clamped_not_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "g", None), (2, "g", 0), (3, "g", 5)],
            "doc_id long, source string, n_chars long",
        )
        out = D.weighted_sample_k(df, 3, weight_col="n_chars").collect()
        assert sorted(r.doc_id for r in out) == [1, 2, 3]


class TestIsotonicCalibrate:
    def _fit(self, spark, rows):
        df = spark.createDataFrame(rows, "score long, label long")
        return {r.score: r for r in D.isotonic_calibrate(df).collect()}

    def test_pools_violating_blocks(self, spark):
        # score 1: 2/2 positive; score 2: 0/2 positive -> violation,
        # pooled to 2/4 = 0.5 for both; score 3 stays 1.0
        rows = (
            [(1, 1), (1, 1), (2, 0), (2, 0), (3, 1), (3, 1)]
        )
        got = self._fit(spark, rows)
        assert got[1].cal_ppm == got[2].cal_ppm == 500_000
        assert got[3].cal_ppm == 1_000_000
        assert (got[1].n, got[1].pos) == (2, 2)   # raw grid stats preserved

    def test_already_monotone_unchanged(self, spark):
        rows = [(1, 0), (1, 0), (2, 0), (2, 1), (3, 1), (3, 1)]
        got = self._fit(spark, rows)
        assert [got[s].cal_ppm for s in (1, 2, 3)] == [0, 500_000, 1_000_000]

    def test_cascade_pool_to_global_mean(self, spark):
        # strictly decreasing empirical rates -> everything pools to 3/6
        rows = [(1, 1), (1, 1), (2, 1), (2, 0), (3, 0), (3, 0)]
        got = self._fit(spark, rows)
        assert all(r.cal_ppm == 500_000 for r in got.values())

    def test_output_is_monotone(self, spark):
        import random
        rng = random.Random(7)
        rows = [
            (s, 1 if rng.random() < s / 20 else 0)
            for s in range(20) for _ in range(30)
        ]
        got = self._fit(spark, rows)
        vals = [got[s].cal_ppm for s in sorted(got)]
        assert vals == sorted(vals)


class TestEditDistanceJoin:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "doc_id long, s string")
        return sorted(
            (r.id_a, r.id_b, r.dist)
            for r in D.edit_distance_join(df, text_col="s", **kw).collect()
        )

    def test_basic_matches_and_k_cutoff(self, spark):
        rows = [
            (1, "abcdefgh"), (2, "abcdefgh"),   # dist 0
            (3, "abcdeXgh"),                     # dist 1 from 1/2
            (4, "XYcdefZh"),                     # dist 3 from 1 -> excluded
            (5, "qqqqqqqq"),                     # unrelated
        ]
        got = self._run(spark, rows, k=2, q=2)
        assert got == [(1, 2, 0), (1, 3, 1), (2, 3, 1)]

    def test_short_strings_fall_back_to_length_block(self, spark):
        # len < q(k+1) = 6: gram threshold non-positive, must still match
        rows = [(1, "cat"), (2, "cut"), (3, "catch"), (4, "zzzzzzzzzz")]
        got = self._run(spark, rows, k=2, q=2)
        assert (1, 2, 1) in got and (1, 3, 2) in got
        assert all(4 not in (a, b) for a, b, _ in got)

    def test_max_df_pruning_keeps_true_pairs(self, spark):
        # every string shares the hot 'aa' grams; pruning them must not
        # lose the true pair thanks to the threshold adjustment
        rows = [(i, "aaaaaaaa" + c) for i, c in enumerate("xyzpq")] + [
            (10, "aaaaaaaax")  # exact dup of row 0
        ]
        unpruned = self._run(spark, rows, k=1, q=2)
        pruned = self._run(spark, rows, k=1, q=2, max_df=3)
        assert unpruned == pruned
        assert (0, 10, 0) in pruned

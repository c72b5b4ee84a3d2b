"""Golden tests for batch-33: waterfill_budget and quantile_normalize."""

from __future__ import annotations

from logstash_spark.operators import dataprep as D


class TestWaterfillBudget:
    def _run(self, spark, counts, budget):
        df = spark.createDataFrame(counts, "source string, n_avail long")
        return {
            r.source: (r.alloc, r.water_level)
            for r in D.waterfill_budget(df, budget).collect()
        }

    def test_level_and_remainder(self, spark):
        counts = [("a", 100), ("b", 10), ("c", 50), ("d", 7)]
        got = self._run(spark, counts, 60)
        # level 21: 21+10+21+7 = 59, remainder 1 -> first capped source (a)
        assert got == {
            "a": (22, 21), "b": (10, 21), "c": (21, 21), "d": (7, 21),
        }
        assert sum(a for a, _ in got.values()) == 60

    def test_budget_exceeds_total(self, spark):
        counts = [("a", 5), ("b", 3)]
        got = self._run(spark, counts, 100)
        assert got == {"a": (5, 5), "b": (3, 5)}

    def test_zero_budget_and_exact_boundary(self, spark):
        counts = [("a", 4), ("b", 4)]
        assert self._run(spark, counts, 0) == {"a": (0, 0), "b": (0, 0)}
        assert self._run(spark, counts, 8) == {"a": (4, 4), "b": (4, 4)}
        got = self._run(spark, counts, 7)
        assert sum(a for a, _ in got.values()) == 7

    def test_sum_invariant_over_sweep(self, spark):
        counts = [("s" + str(i), 3 + 7 * i % 23) for i in range(9)]
        total = sum(n for _, n in counts)
        for budget in (0, 1, 17, 45, total - 1, total, total + 10):
            got = self._run(spark, counts, budget)
            assert sum(a for a, _ in got.values()) == min(budget, total)


class TestQuantileNormalize:
    def test_groups_map_to_same_global_values(self, spark):
        rows = [(i, "a", i) for i in range(1, 6)] + [
            (i + 10, "b", 100 + i) for i in range(1, 6)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = D.quantile_normalize(df).collect()
        by_group = {}
        for r in out:
            by_group.setdefault(r.source, []).append((r.q_ppm, r.norm_value))
        assert sorted(by_group["a"]) == sorted(by_group["b"])
        # extremes hit global min/max
        vals = {r.q_ppm: r.norm_value for r in out if r.source == "a"}
        assert vals[0] == 1 and vals[1_000_000] == 105

    def test_single_row_group_gets_median(self, spark):
        rows = [(1, "solo", 7)] + [(i, "big", i) for i in range(2, 12)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = {r.doc_id: r for r in D.quantile_normalize(df).collect()}
        assert out[1].q_ppm == 500_000
        # global N=11, target = 1 + 500000*10 div 1e6 = 6 -> 6th value
        allv = sorted([7] + list(range(2, 12)))
        assert out[1].norm_value == allv[5]

    def test_idempotent_on_uniform_group_structure(self, spark):
        # one group only: normalization must be the identity
        rows = [(i, "g", 10 * i) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = D.quantile_normalize(df).collect()
        assert all(r.norm_value == r.n_chars for r in out)


class TestRankCorrelation:
    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "qid long, item long, score_a long, score_b long"
        )
        return {r.qid: r for r in D.rank_correlation(df).collect()}

    def test_agreement_reversal_and_partial(self, spark):
        rows = []
        for i in range(5):
            rows.append((0, i, 100 - i, 100 - i))   # identical order
            rows.append((1, i, 100 - i, i))          # exact reversal
        # one adjacent swap among 5: tau = (10-2·1)/10 = 0.8, rho = 1 - 6·2/120
        rows += [(2, 0, 50, 50), (2, 1, 40, 30), (2, 2, 30, 40),
                 (2, 3, 20, 19), (2, 4, 10, 9)]
        got = self._run(spark, rows)
        assert (got[0].tau_ppm, got[0].rho_ppm) == (1_000_000, 1_000_000)
        assert (got[1].tau_ppm, got[1].rho_ppm) == (-1_000_000, -1_000_000)
        assert (got[2].tau_ppm, got[2].rho_ppm) == (800_000, 900_000)
        assert got[2].sum_d2 == 2

    def test_single_item_group_is_null(self, spark):
        got = self._run(spark, [(9, 0, 5, 5)])
        assert got[9].n == 1
        assert got[9].tau_ppm is None and got[9].rho_ppm is None

    def test_ties_pinned_by_item_order(self, spark):
        # all scores equal: both rankers produce the same item-asc order
        rows = [(4, i, 7, 7) for i in range(4)]
        got = self._run(spark, rows)
        assert (got[4].tau_ppm, got[4].rho_ppm) == (1_000_000, 1_000_000)


class TestMixDivergence:
    def _run(self, spark, counts, weights):
        df = spark.createDataFrame(counts, "source string, n long")
        return {r.source: r for r in D.mix_divergence(df, weights).collect()}

    def test_matching_mix_is_near_zero(self, spark):
        got = self._run(
            spark, [("a", 100), ("b", 100)], {"a": 1, "b": 1}
        )
        # real KL is exactly 0; L-quantization leaves ≤ a few micro-nats
        assert abs(got["a"].kl_micro_total) <= 4

    def test_skewed_mix_positive_and_exact(self, spark):
        import math
        counts = [("a", 300), ("b", 100)]
        got = self._run(spark, counts, {"a": 1, "b": 1})
        def L(k):
            return math.floor(math.log(k) * 1_000_000)
        exp = (300 * (L(300) - L(400) - L(1) + L(2))
               + 100 * (L(100) - L(400) - L(1) + L(2))) // 400
        assert got["a"].kl_micro_total == exp
        assert got["a"].kl_contrib_micro == 300 * (L(300) - L(400) + L(2))

    def test_rogue_source_nulls_total(self, spark):
        got = self._run(spark, [("a", 10), ("zz", 5)], {"a": 1})
        assert got["zz"].in_target is False
        assert got["zz"].kl_contrib_micro is None
        assert got["a"].kl_micro_total is None


class TestRendezvousShard:
    def test_minimal_movement_on_shard_add(self, spark):
        df = spark.createDataFrame(
            [(i,) for i in range(400)], "doc_id long"
        )
        before = {
            r.doc_id: r.shard
            for r in D.rendezvous_shard(df, [f"s{i}" for i in range(7)]).collect()
        }
        after = {
            r.doc_id: r.shard
            for r in D.rendezvous_shard(df, [f"s{i}" for i in range(8)]).collect()
        }
        moved = {k for k in before if before[k] != after[k]}
        # every moved key lands on the NEW shard — never between old ones
        assert all(after[k] == "s7" for k in moved)
        # and roughly 1/8 of keys move (hash-fixed, deterministic)
        assert 20 <= len(moved) <= 80

    def test_deterministic_and_zero_shuffle(self, spark):
        df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
        a = D.rendezvous_shard(df, ["x", "y", "z"]).collect()
        b = D.rendezvous_shard(df, ["x", "y", "z"]).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        plan = D.rendezvous_shard(df, ["x", "y"])._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestWinsorize:
    def test_clips_tails_only(self, spark):
        rows = [(i, "g", v) for i, v in enumerate(
            [1, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 1000]
        )]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        got = {r.doc_id: r for r in D.winsorize(df).collect()}
        # n=13: lo rank = 1 + 12*0.05 = 1 -> min value; hi rank = 1+11 = 12
        assert got[0].lo == 1 and got[0].hi == 20
        assert got[12].clipped == 20 and got[12].was_clipped
        assert got[5].clipped == 14 and not got[5].was_clipped

    def test_degenerate_single_value_group(self, spark):
        rows = [(i, "g", 7) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = D.winsorize(df).collect()
        assert all(r.lo == 7 and r.hi == 7 and not r.was_clipped for r in out)


class TestRboOverlap:
    def _run(self, spark, pairs, **kw):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "qid long, list_a array<string>, list_b array<string>",
        )
        return {r.qid: r.rbo_ppm for r in D.rbo_overlap(df, **kw).collect()}

    def test_identical_disjoint_and_python_rederivation(self, spark):
        import math
        ident = [f"i{j}" for j in range(10)]
        disjoint = [f"z{j}" for j in range(10)]
        swapped = [ident[1], ident[0]] + ident[2:]
        got = self._run(spark, [(ident, ident), (ident, disjoint), (ident, swapped)])
        p, k = 0.9, 10
        w = [((1 - p) * p**d) / (d + 1) for d in range(k)]
        def rbo(a, b):
            t = 0.0
            for d in range(1, k + 1):
                t += len(set(a[:d]) & set(b[:d])) * w[d - 1]
            return math.floor(t * 1_000_000.0)
        assert got[0] == rbo(ident, ident)
        assert got[1] == 0
        assert got[2] == rbo(ident, swapped)
        # the swap only costs at depth 1: deeper prefixes contain both
        assert got[0] - got[2] == math.floor(1e6 * (rbo(ident, ident) - rbo(ident, swapped)) / 1e6)

    def test_short_and_empty_lists(self, spark):
        got = self._run(spark, [(["a"], ["a"]), ([], ["a", "b"])])
        assert got[1] == 0
        assert got[0] > 0  # overlap 1 at every depth, clamped slices

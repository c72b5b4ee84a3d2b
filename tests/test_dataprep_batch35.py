"""Golden tests for batch-35: zipf_fit and kcenter_select."""

from __future__ import annotations

import math

from logstash_spark.operators import dataprep as D


class TestZipfFit:
    def test_exact_zipf_slope_near_minus_one(self, spark):
        # counts c_r = floor(1000 / r) for ranks 1..50: a textbook Zipf
        # corpus. Words w01..w50 rendered count-many times each.
        rows = []
        did = 0
        for r in range(1, 51):
            for _ in range(1000 // r):
                rows.append((did, f"w{r:02d}"))
                did += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        row = D.zipf_fit(docs, top_k=50).collect()[0]
        assert row.n_types == 50
        assert row.n_head == 50
        assert row.total_tokens == sum(1000 // r for r in range(1, 51))
        # exact replication of the quantized OLS
        pts = [
            (math.floor(math.log(r) * 1e6), math.floor(math.log(1000 // r) * 1e6))
            for r in range(1, 51)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        ratio = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        assert row.slope_micro == math.floor(ratio * 1_000_000.0)
        assert row.intercept_micro == math.floor((float(sy) - ratio * float(sx)) / n)
        # and the qualitative Zipf reading survives quantization
        assert -1_100_000 <= row.slope_micro <= -950_000

    def test_degenerate_single_type(self, spark):
        docs = spark.createDataFrame(
            [(1, "same"), (2, "same")], "doc_id long, text string"
        )
        row = D.zipf_fit(docs).collect()[0]
        assert row.n_types == 1 and row.n_head == 1
        assert row.slope_micro is None and row.intercept_micro is None

    def test_head_restriction(self, spark):
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(i % 7 + 1)))
             for i in range(30)],
            "doc_id long, text string",
        )
        row = D.zipf_fit(docs, top_k=3).collect()[0]
        assert row.n_head == 3
        assert row.n_types == 7


class TestKCenterSelect:
    def _df(self, spark, pts):
        # 2-d points embedded in the (id, vec) contract
        return spark.createDataFrame(
            [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)],
            "vec_id long, embedding array<float>",
        )

    def test_farthest_point_order(self, spark):
        # seed = id 0 at origin; farthest is (10,0); then (0,6); then (4,0)
        pts = [(0, 0), (10, 0), (0, 6), (4, 0)]
        out = D.kcenter_select(self._df(spark, pts), 4).collect()
        order = {r.sel_order: r.vec_id for r in out}
        assert order[0] == 0
        assert order[1] == 1  # d2 = (10*1000)^2
        assert order[2] == 2  # min-dist to {0,1} = 36e6 > id3's 16e6
        assert order[3] == 3
        d = {r.vec_id: r.dist_sq for r in out}
        assert d[0] is None
        assert d[1] == (10 * 1000) ** 2
        assert d[2] == (6 * 1000) ** 2
        assert d[3] == (4 * 1000) ** 2

    def test_tie_breaks_to_min_id(self, spark):
        # ids 1 and 2 equidistant from seed 0: pick 1
        pts = [(0, 0), (5, 0), (0, 5), (1, 0)]
        out = D.kcenter_select(self._df(spark, pts), 2).collect()
        order = {r.sel_order: r.vec_id for r in out}
        assert order[1] == 1

    def test_k_larger_than_candidates(self, spark):
        pts = [(0, 0), (3, 0)]
        out = D.kcenter_select(self._df(spark, pts), 10).collect()
        assert len(out) == 2  # never fabricates picks

    def test_coverage_radius_decreases(self, spark):
        pts = [(i * i % 17, (3 * i) % 11) for i in range(15)]
        out = sorted(
            D.kcenter_select(self._df(spark, pts), 6).collect(),
            key=lambda r: r.sel_order,
        )
        dists = [r.dist_sq for r in out[1:]]
        # farthest-point property: selection distances are non-increasing
        assert all(a >= b for a, b in zip(dists, dists[1:]))


class TestHeapsGrowth:
    def test_growth_counts_exact(self, spark):
        rows = [
            (1, "a b"),        # rank 1: types {a,b}
            (2, "b c"),        # rank 2: +c
            (3, "a b c"),      # rank 3: +0
            (4, "d"),          # rank 4: +d
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.checkpoint_docs: (r.tokens_cum, r.types_cum, r.types_ppm_of_tokens)
            for r in D.heaps_growth(docs, [1, 2, 4]).collect()
        }
        assert got[1] == (2, 2, 1_000_000)
        assert got[2] == (4, 3, 750_000)
        assert got[4] == (8, 4, 500_000)

    def test_checkpoint_beyond_corpus(self, spark):
        docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        got = {
            r.checkpoint_docs: (r.tokens_cum, r.types_cum)
            for r in D.heaps_growth(docs, [1, 100]).collect()
        }
        assert got[100] == got[1] == (2, 2)

    def test_id_order_not_input_order(self, spark):
        # rows supplied out of id order: rank follows doc_id
        rows = [(2, "new1 new2"), (1, "base")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.checkpoint_docs: r.types_cum
            for r in D.heaps_growth(docs, [1, 2]).collect()
        }
        assert got[1] == 1  # doc_id 1 only
        assert got[2] == 3

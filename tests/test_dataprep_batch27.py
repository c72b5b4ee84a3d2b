"""Golden tests for batch-27: auc_binary (exact Mann-Whitney) and
negative sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "score long, label boolean")
    return D.auc_binary(df).collect()[0]


class TestAucBinary:
    def test_hand_computed_with_ties(self, spark):
        # pos {3, 1}, neg {2, 1}: pairs 3>2, 3>1, 1<2, 1=1 (half)
        r = _auc(spark, [(3, True), (1, True), (2, False), (1, False)])
        assert (r.n_pos, r.n_neg) == (2, 2)
        assert r.auc_ppm == 625000

    def test_perfect_and_inverted(self, spark):
        perfect = _auc(spark, [(10, True), (9, True), (1, False), (0, False)])
        assert perfect.auc_ppm == 1000000
        inverted = _auc(spark, [(0, True), (1, False)])
        assert inverted.auc_ppm == 0

    def test_chance_level(self, spark):
        r = _auc(spark, [(5, True), (5, False), (5, True), (5, False)])
        assert r.auc_ppm == 500000  # all ties

    def test_degenerate_single_class(self, spark):
        r = _auc(spark, [(1, True), (2, True)])
        assert r.auc_ppm is None


class TestNegativeSampling:
    def _table(self, spark):
        vocab = spark.createDataFrame(
            [("a", 16), ("b", 1), ("c", 81)], "word string, cnt long"
        )
        return D.negative_sampling_table(vocab)

    def test_weights_are_exact_three_quarter_power(self, spark):
        t = {r.word: r for r in self._table(spark).collect()}
        assert t["a"].w == 8      # 16^(3/4)
        assert t["b"].w == 1
        assert t["c"].w == 27     # 81^(3/4)

    def test_ranges_contiguous_count_desc(self, spark):
        rows = sorted(self._table(spark).collect(), key=lambda r: r.lo)
        # order: c (81), a (16), b (1)
        assert [r.word for r in rows] == ["c", "a", "b"]
        assert rows[0].lo == 0
        for prev, cur in zip(rows, rows[1:]):
            assert cur.lo == prev.hi

    def test_sampling_deterministic_and_weighted(self, spark):
        table = self._table(spark)
        pairs = spark.range(0, 300).select(F.col("id").alias("pair_id"))
        out = D.sample_negatives(pairs, table, k=2).collect()
        assert len(out) == 600
        again = D.sample_negatives(pairs, table, k=2).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))
        freq = {}
        for r in out:
            freq[r.negative] = freq.get(r.negative, 0) + 1
        # c carries 27/36 of the mass, b only 1/36
        assert freq["c"] > freq["a"] > freq.get("b", 0)

"""Golden tests for batch-28: pr_curve and cohens_kappa."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from logstash_spark.operators import dataprep as D


class TestPrCurve:
    def test_hand_computed(self, spark):
        # scores/labels: (5,+), (4,-), (3,+), (1,-)
        rows = [(5, True), (4, False), (3, True), (1, False)]
        df = spark.createDataFrame(rows, "score long, label boolean")
        got = {r.threshold: r for r in D.pr_curve(df).collect()}
        assert set(got) == {5, 4, 3, 1}
        # t=5: predict {5}: tp 1 fp 0 -> p 1.0, r 0.5
        assert (got[5].tp, got[5].fp, got[5].fn) == (1, 0, 1)
        assert got[5].precision_ppm == 1000000
        assert got[5].recall_ppm == 500000
        # t=3: predict {5,4,3}: tp 2, fp 1 -> p 2/3, r 1
        assert (got[3].tp, got[3].fp) == (2, 1)
        assert got[3].precision_ppm == 666666
        assert got[3].recall_ppm == 1000000
        # f1 at t=3 = 2*2/(2+3) = 0.8
        assert got[3].f1_ppm == 800000
        # t=1: everything positive
        assert (got[1].tp, got[1].fp, got[1].fn) == (2, 2, 0)

    def test_recall_monotone_down_thresholds(self, spark):
        rows = [(i % 10, i % 3 == 0) for i in range(200)]
        df = spark.createDataFrame(rows, "score long, label boolean")
        pts = sorted(D.pr_curve(df).collect(), key=lambda r: -r.threshold)
        recalls = [r.recall_ppm for r in pts]
        assert recalls == sorted(recalls)


class TestCohensKappa:
    def _run(self, spark, rows):
        df = spark.createDataFrame(rows, "rater_a string, rater_b string")
        return D.cohens_kappa(df).collect()[0]

    def test_perfect_agreement(self, spark):
        r = self._run(spark, [("x", "x"), ("y", "y"), ("x", "x"), ("z", "z")])
        assert r.agree_ppm == 1000000
        assert r.kappa_ppm == 1000000

    def test_hand_computed(self, spark):
        # classic 2x2: a=(A:3,B:1), b=(A:2,B:2), agree=2 of 4
        rows = [("A", "A"), ("A", "B"), ("A", "A"), ("B", "B")]
        r = self._run(spark, rows)
        # po=0.5... wait agree: AA, AB(no), AA, BB -> 3 agree
        assert r.agree_ppm == 750000
        # pe*N^2 = 3*2 + 1*2 = 8; kappa = (4*3 - 8)/(16 - 8) = 0.5
        assert r.kappa_ppm == 500000

    def test_chance_only_is_zero(self, spark):
        # independent raters, perfectly balanced: kappa ~ 0 exactly here
        rows = [("A", "A"), ("A", "B"), ("B", "A"), ("B", "B")]
        r = self._run(spark, rows)
        assert r.kappa_ppm == 0

    def test_degenerate_constant_raters(self, spark):
        r = self._run(spark, [("A", "A"), ("A", "A")])
        assert r.kappa_ppm is None  # pe = 1

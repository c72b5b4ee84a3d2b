"""Golden tests for batch-22: quantize_embedding_int8."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _q(spark, vec):
    df = spark.createDataFrame([(vec,)], "v array<double>")
    feats = D.quantize_embedding_int8(F.col("v"))
    r = df.select(
        feats["q"].alias("q"), feats["scale"].alias("s"),
        feats["n_dim"].alias("n"),
    ).collect()[0]
    return list(r["q"]), r["s"], r["n"]


class TestQuantizeInt8:
    def test_hand_computed(self, spark):
        q, s, n = _q(spark, [1.0, -0.5, 0.25, 0.0])
        assert s == 1.0 and n == 4
        # floor(x*127 + 0.5): 127, floor(-63.5+0.5)=-63, floor(31.75+.5)=32, 0
        assert q == [127, -63, 32, 0]

    def test_extremes_in_range(self, spark):
        q, s, _ = _q(spark, [3.0, -3.0, 1.5])
        assert s == 3.0
        assert q == [127, -127, 64]  # floor(63.5+0.5) = 64
        assert all(-127 <= x <= 127 for x in q)

    def test_zero_vector(self, spark):
        q, s, _ = _q(spark, [0.0, 0.0])
        assert s == 0.0 and q == [0, 0]

    def test_dequant_error_bounded(self, spark):
        vec = [0.731, -0.228, 0.054, -0.999, 0.5]
        q, s, _ = _q(spark, vec)
        for orig, qq in zip(vec, q):
            assert abs(orig - qq * s / 127.0) <= s / 127.0 / 2 + 1e-12

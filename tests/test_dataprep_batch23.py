"""Golden tests for batch-23: ann_topk_int8 (quantized search) and
field_coverage_profile."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


class TestAnnTopkInt8:
    def _vecs(self, spark):
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),    # closest to 0
            (2, [0.0, 1.0, 0.0]),    # orthogonal
            (3, [-1.0, 0.0, 0.0]),   # opposite
            (4, [0.7, 0.7, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_ranking_matches_geometry(self, spark):
        em = self._vecs(spark)
        out = (
            D.ann_topk_int8(em, em.where("vec_id = 0"), k=4)
            .orderBy("rank")
            .collect()
        )
        assert [r.c_id for r in out] == [1, 4, 2, 3]
        assert out[0].cos_q6 == pytest.approx(
            0.9 / math.hypot(0.9, 0.1), abs=0.01
        )
        assert out[-1].cos_q6 == -1.0

    def test_scale_invariance(self, spark):
        # scaling a candidate must not change its quantized cosine
        rows = [(0, [1.0, 2.0]), (1, [10.0, 20.0]), (2, [0.1, 0.2])]
        em = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = D.ann_topk_int8(em, em.where("vec_id = 0"), k=2).collect()
        assert all(r.cos_q6 == 1.0 for r in out)

    def test_zero_vectors_dropped(self, spark):
        rows = [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])]
        em = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = D.ann_topk_int8(em, em.where("vec_id = 0"), k=5).collect()
        assert {r.c_id for r in out} == {2}


class TestFieldCoverageProfile:
    def test_counts(self, spark):
        rows = [
            ("en", "web", "1"),
            (None, "  ", "2"),
            ("en", "book", None),
            ("fr", "", "2"),
        ]
        df = spark.createDataFrame(rows, "lang string, src string, v string")
        got = {
            r.col: r
            for r in D.field_coverage_profile(df, ["lang", "src", "v"]).collect()
        }
        assert (got["lang"].n_null, got["lang"].n_blank) == (1, 0)
        assert got["lang"].n_distinct == 2
        assert got["lang"].coverage_ppm == 750000
        assert (got["src"].n_null, got["src"].n_blank) == (0, 2)
        assert got["src"].n_distinct == 4  # "  " and "" are distinct values
        assert got["v"].n_distinct == 2
        assert all(r.n_rows == 4 for r in got.values())

    def test_empty_cols_raises(self, spark):
        df = spark.createDataFrame([("x",)], "a string")
        with pytest.raises(ValueError):
            D.field_coverage_profile(df, [])

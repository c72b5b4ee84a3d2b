"""Golden tests for batch-25: mmr_topk (diversified retrieval)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _corpus(spark):
    rows = [
        (0, [1.0, 0.0]),      # query
        (1, [0.99, 0.02]),    # A1: closest
        (2, [0.98, 0.03]),    # A2: near-dup of A1
        (3, [0.97, 0.04]),    # A3: near-dup
        (4, [0.5, 0.5]),      # B: diverse, still relevant
        (5, [0.0, 1.0]),      # C: orthogonal
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestMmrTopk:
    def test_low_lambda_prefers_diversity(self, spark):
        em = _corpus(spark)
        out = (
            D.mmr_topk(em, em.where("vec_id = 0"), k=3, lambda_ppm=300_000)
            .orderBy("rank")
            .collect()
        )
        # A1 first (pure relevance); at λ=0.3 the orthogonal C beats
        # everything similar to A1, then the mid-angle B beats the A
        # near-dups — relevance order alone would give [1, 2, 3]
        assert [r.c_id for r in out] == [1, 5, 4]

    def test_high_lambda_reduces_to_relevance_order(self, spark):
        em = _corpus(spark)
        out = (
            D.mmr_topk(em, em.where("vec_id = 0"), k=3, lambda_ppm=1_000_000)
            .orderBy("rank")
            .collect()
        )
        assert [r.c_id for r in out] == [1, 2, 3]

    def test_fewer_candidates_than_k(self, spark):
        rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.5, 0.5])]
        em = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = D.mmr_topk(em, em.where("vec_id = 0"), k=5).collect()
        assert len(out) == 2  # sentinel slots dropped
        assert {r.c_id for r in out} == {1, 2}

    def test_ranks_contiguous_and_rel_monotone_at_rank1(self, spark):
        em = _corpus(spark)
        out = (
            D.mmr_topk(em, em.where("vec_id = 0"), k=3, lambda_ppm=300_000)
            .orderBy("rank")
            .collect()
        )
        assert [r.rank for r in out] == [1, 2, 3]
        assert out[0].rel_u == max(r.rel_u for r in out)

    def test_bad_lambda_raises(self, spark):
        em = _corpus(spark)
        with pytest.raises(ValueError):
            D.mmr_topk(em, em, lambda_ppm=2_000_000)

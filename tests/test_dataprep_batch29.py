"""Golden tests for batch-29: ranking_metrics (MRR / recall@k / NDCG@k)."""

from __future__ import annotations

import math

from logstash_spark.operators import dataprep as D


def _frames(spark, run_rows, qrel_rows):
    run = spark.createDataFrame(run_rows, "q_id long, doc_id long, rank int")
    qrels = spark.createDataFrame(qrel_rows, "q_id long, doc_id long, rel int")
    return run, qrels


class TestRankingMetrics:
    def test_hand_computed(self, spark):
        # q0: ranked docs 1..4; relevant = {2 (rel 2), 4 (rel 1), 9 (rel 1,
        # never retrieved)}. At k=3 only doc 2 (rank 2) is in window.
        run = [(0, 1, 1), (0, 2, 2), (0, 3, 3), (0, 4, 4)]
        qrels = [(0, 2, 2), (0, 4, 1), (0, 9, 1)]
        r, q = _frames(spark, run, qrels)
        row = D.ranking_metrics(r, q, k=3).collect()[0]
        assert row.q_id == 0
        assert row.mrr_ppm == 500000  # first relevant at rank 2
        assert row.n_rel == 3
        assert row.recall_k_ppm == 333333  # 1 of 3 relevant in top-3
        # DCG = (2^2-1)/log2(3) = 3/log2(3); IDCG over best ordering
        # [2,1,1] = 3/1 + 1/log2(3) + 1/2
        dcg = 3.0 / math.log2(3.0)
        idcg = 3.0 + 1.0 / math.log2(3.0) + 0.5
        assert row.ndcg_k_ppm == math.floor(dcg / idcg * 1e6)

    def test_perfect_ranking(self, spark):
        # all relevant docs retrieved first, in ideal grade order
        run = [(7, 10, 1), (7, 11, 2), (7, 12, 3)]
        qrels = [(7, 10, 2), (7, 11, 1)]
        r, q = _frames(spark, run, qrels)
        row = D.ranking_metrics(r, q, k=10).collect()[0]
        assert row.mrr_ppm == 1000000
        assert row.recall_k_ppm == 1000000
        assert row.ndcg_k_ppm == 1000000

    def test_no_relevant_retrieved(self, spark):
        run = [(1, 5, 1), (1, 6, 2)]
        qrels = [(1, 99, 1)]
        r, q = _frames(spark, run, qrels)
        row = D.ranking_metrics(r, q, k=10).collect()[0]
        assert row.mrr_ppm == 0
        assert row.recall_k_ppm == 0
        assert row.ndcg_k_ppm == 0
        assert row.n_rel == 1

    def test_query_with_no_qrels_at_all(self, spark):
        # a query absent from qrels entirely: all-zero metrics, n_rel 0
        run = [(3, 1, 1)]
        qrels = [(4, 1, 1)]
        r, q = _frames(spark, run, qrels)
        rows = {x.q_id: x for x in D.ranking_metrics(r, q, k=5).collect()}
        assert rows[3].mrr_ppm == 0
        assert rows[3].recall_k_ppm == 0
        assert rows[3].ndcg_k_ppm == 0
        assert rows[3].n_rel == 0

    def test_rank_beyond_k_ignored(self, spark):
        # the only relevant doc sits at rank k+1 -> zero across the board
        run = [(2, 1, 1), (2, 2, 2), (2, 3, 3)]
        qrels = [(2, 3, 2)]
        r, q = _frames(spark, run, qrels)
        row = D.ranking_metrics(r, q, k=2).collect()[0]
        assert row.mrr_ppm == 0
        assert row.recall_k_ppm == 0
        assert row.ndcg_k_ppm == 0

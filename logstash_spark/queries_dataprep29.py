"""Correctness-gate queries, dataprep batch 29 (round 3): retrieval
ranking metrics (MRR / recall@k / NDCG@k). The oracle re-derives all
three with DuckDB list machinery; the NDCG folds run in the same
left-to-right list order on both engines, so the double sums are
bit-identical before the single floor(·10⁶).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "retrieval_ranking_metrics",
    f"""
    WITH base AS (
      SELECT doc_id, doc_id // 50 AS q_id,
             CAST(doc_id % 50 + 1 AS INT) AS rank,
             CASE {_H32.format(s="doc_id || ':rel'")} % 7
               WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END AS rel
      FROM documents
    ),
    topk AS (
      SELECT q_id,
             list_sort(list_zip(
               list(rank ORDER BY rank), list(rel ORDER BY rank)))
               AS l
      FROM base WHERE rank <= 10 GROUP BY q_id
    ),
    perq AS (
      SELECT q_id,
             coalesce(list_min(list_transform(
               list_filter(l, x -> x[2] > 0), x -> CAST(x[1] AS BIGINT))),
               0) AS first_rank,
             CAST(len(list_filter(l, x -> x[2] > 0)) AS BIGINT) AS hits,
             list_sum(list_transform(l,
               x -> (pow(2.0, CAST(x[2] AS DOUBLE)) - 1.0)
                    / log2(CAST(x[1] AS DOUBLE) + 1.0))) AS dcg
      FROM topk
    ),
    ideal AS (
      SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel,
             list_sum(list_transform(
               list_zip(
                 (list_sort(list(rel), 'DESC'))[1:10],
                 range(1, least(CAST(count(*) AS BIGINT), 10) + 1)),
               x -> (pow(2.0, CAST(x[1] AS DOUBLE)) - 1.0)
                    / log2(CAST(x[2] AS DOUBLE) + 1.0))) AS idcg
      FROM base WHERE rel > 0 GROUP BY q_id
    )
    SELECT p.q_id,
           CAST(CASE WHEN first_rank > 0 THEN floor(1000000.0 / first_rank)
                     ELSE 0 END AS BIGINT) AS mrr_ppm,
           CAST(CASE WHEN coalesce(n_rel, 0) > 0
                     THEN (hits * 1000000) // n_rel ELSE 0 END AS BIGINT)
             AS recall_k_ppm,
           CAST(CASE WHEN coalesce(idcg, 0) > 0
                     THEN floor(dcg / idcg * 1000000.0) ELSE 0 END AS BIGINT)
             AS ndcg_k_ppm,
           CAST(coalesce(n_rel, 0) AS BIGINT) AS n_rel
    FROM perq p LEFT JOIN ideal i ON p.q_id = i.q_id
    """,
)
def retrieval_ranking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-metrics gate (`dataprep.ranking_metrics`): 50-candidate
    ranked runs per query with hash-graded relevance (rel 2/1/0),
    judged at k=10 — relevant docs beyond rank 10 exist, so recall@10
    is meaningfully below 1. MRR and recall are exact integers; the
    NDCG folds are order-pinned doubles floored once at the end."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    base = docs.select(
        "doc_id",
        F.expr("doc_id DIV 50").alias("q_id"),
        (i % 50 + 1).cast("int").alias("rank"),
        F.when(
            D.portable_hash32(F.concat(i.cast("string"), F.lit(":rel"))) % 7
            == 0,
            F.lit(2),
        )
        .when(
            D.portable_hash32(F.concat(i.cast("string"), F.lit(":rel"))) % 7
            == 1,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("rel"),
    )
    run = base.select("q_id", "doc_id", "rank")
    qrels = base.where(F.col("rel") > 0).select("q_id", "doc_id", "rel")
    return D.ranking_metrics(run, qrels, k=10)

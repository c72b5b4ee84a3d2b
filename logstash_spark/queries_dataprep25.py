"""Correctness-gate queries, dataprep batch 25 (round 3): MMR
diversified top-k. The oracle UNROLLS the greedy selection (k=3) as
three relational argmax stages over an explicit pairwise-similarity
table — a fully independent derivation of the recurrence the operator
evaluates array-locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_QZ = (
    "CASE WHEN list_max(list_transform({v}, x -> abs(x))) > 0 "
    "THEN list_transform({v}, x -> CAST(floor(x * 127.0 "
    "/ list_max(list_transform({v}, y -> abs(y))) + 0.5) AS BIGINT)) "
    "ELSE list_transform({v}, x -> CAST(0 AS BIGINT)) END"
)

_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)))"
)

_LAM = 300_000
_SHORT = 8


@query(
    "mmr_diverse_topk",
    f"""
    WITH z AS (
      SELECT vec_id, {_QZ.format(v="embedding")} AS q FROM embeddings
    ),
    n AS (
      SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS n2
      FROM z
    ),
    nn AS (SELECT * FROM n WHERE n2 > 0),
    qs AS (SELECT vec_id AS q_id, q AS qq, n2 AS qn2 FROM nn
           WHERE vec_id < 3),
    rel AS (
      SELECT q_id, c.vec_id AS c_id, c.q AS cq, c.n2 AS cn2,
             CAST(floor({_DOT.format(a="qq", b="c.q")}
                  / sqrt(CAST(qn2 * c.n2 AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS rel_u
      FROM qs, nn c WHERE q_id != c.vec_id
    ),
    cand AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY rel_u DESC, c_id) AS rnk
        FROM rel) WHERE rnk <= {_SHORT}
    ),
    sim AS (
      SELECT a.q_id, a.c_id AS ia, b.c_id AS ib,
             CAST(floor({_DOT.format(a="a.cq", b="b.cq")}
                  / sqrt(CAST(a.cn2 * b.cn2 AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS s
      FROM cand a JOIN cand b
        ON a.q_id = b.q_id AND a.c_id != b.c_id
    ),
    s1 AS (SELECT q_id, c_id, rel_u FROM cand WHERE rnk = 1),
    sc2 AS (
      SELECT c.q_id, c.c_id, c.rel_u,
             {_LAM} * c.rel_u - {1_000_000 - _LAM} * sim.s AS score
      FROM cand c
      JOIN s1 ON c.q_id = s1.q_id AND c.c_id != s1.c_id
      JOIN sim ON sim.q_id = c.q_id AND sim.ia = c.c_id
              AND sim.ib = s1.c_id
    ),
    s2 AS (
      SELECT q_id, c_id, rel_u FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY score DESC, rel_u DESC, c_id) AS rr
        FROM sc2) WHERE rr = 1
    ),
    sc3 AS (
      SELECT c.q_id, c.c_id, c.rel_u,
             {_LAM} * c.rel_u
               - {1_000_000 - _LAM} * greatest(x1.s, x2.s) AS score
      FROM cand c
      JOIN s1 ON c.q_id = s1.q_id
      JOIN s2 ON c.q_id = s2.q_id
      JOIN sim x1 ON x1.q_id = c.q_id AND x1.ia = c.c_id
                 AND x1.ib = s1.c_id
      JOIN sim x2 ON x2.q_id = c.q_id AND x2.ia = c.c_id
                 AND x2.ib = s2.c_id
      WHERE c.c_id != s1.c_id AND c.c_id != s2.c_id
    ),
    s3 AS (
      SELECT q_id, c_id, rel_u FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                     ORDER BY score DESC, rel_u DESC, c_id) AS rr
        FROM sc3) WHERE rr = 1
    )
    SELECT q_id, CAST(1 AS INTEGER) AS rank, c_id, rel_u FROM s1
    UNION ALL SELECT q_id, 2, c_id, rel_u FROM s2
    UNION ALL SELECT q_id, 3, c_id, rel_u FROM s3
    """,
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR gate (`dataprep.mmr_topk`): diversified top-3 for three
    queries over the real embeddings table, λ=0.3, 8-candidate
    shortlist. The operator evaluates the greedy recurrence as one
    array-local aggregate over the grouped shortlist; the oracle
    unrolls the same recurrence as three relational argmax stages over
    an explicit pairwise-similarity join — any drift in the scoring,
    tie-breaks, or max-sim bookkeeping breaks the hash match."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return D.mmr_topk(
        em,
        em.where(F.col("vec_id") < 3),
        k=3,
        lambda_ppm=_LAM,
        shortlist=_SHORT,
    )

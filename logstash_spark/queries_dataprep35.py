"""Correctness-gate queries, dataprep batch 35 (round 4): the Zipf
rank-frequency head fit and greedy k-center coreset selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


@query(
    "zipf_head_fit",
    """
    WITH v AS (
      SELECT t, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE t <> '' GROUP BY t
    ),
    h AS (
      SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
             CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
      FROM (SELECT c, row_number() OVER (ORDER BY c DESC, t ASC) AS r FROM v)
      WHERE r <= 100
    ),
    tails AS (
      SELECT CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(c) AS BIGINT) AS total_tokens
      FROM v
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM h
    )
    SELECT n_types, total_tokens, n AS n_head,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(floor((CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * 1000000.0) AS BIGINT) END AS slope_micro,
           CASE WHEN n * sxx - sx * sx <> 0 THEN
             CAST(floor((CAST(sy AS DOUBLE)
                         - (CAST(n * sxy - sx * sy AS DOUBLE)
                            / CAST(n * sxx - sx * sx AS DOUBLE))
                           * CAST(sx AS DOUBLE)) / n) AS BIGINT)
           END AS intercept_micro
    FROM s CROSS JOIN tails
    """,
)
def zipf_head_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law gate (`dataprep.zipf_fit`): OLS slope/intercept over the
    (L(rank), L(count)) head grid, every regression sum exact int64 and
    the two outputs single pinned-order double expressions — the oracle
    replays rank, quantization, sums, and both divisions."""
    from logstash_spark.operators.dataprep import zipf_fit  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return zipf_fit(docs, top_k=100)


_KC_Q = """
    q AS (
      SELECT vec_id AS id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
      FROM embeddings WHERE vec_id < 40
    ),
    d AS (
      SELECT a.id AS ia, b.id AS ib,
             CAST(list_sum(list_transform(range(1, 65),
                  i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])))
                  AS BIGINT) AS d2
      FROM q a CROSS JOIN q b
    )
"""


@query(
    "kcenter_coreset",
    f"""
    WITH {_KC_Q},
    s0 AS (SELECT min(id) AS id FROM q),
    m0 AS (SELECT d.ia AS id, d.d2 AS mind
           FROM d JOIN s0 ON d.ib = s0.id WHERE d.ia <> s0.id),
    s1 AS (SELECT id, mind FROM m0 ORDER BY mind DESC, id ASC LIMIT 1),
    m1 AS (SELECT m0.id, least(m0.mind, d.d2) AS mind
           FROM m0 JOIN s1 ON m0.id <> s1.id
           JOIN d ON d.ia = m0.id AND d.ib = s1.id),
    s2 AS (SELECT id, mind FROM m1 ORDER BY mind DESC, id ASC LIMIT 1),
    m2 AS (SELECT m1.id, least(m1.mind, d.d2) AS mind
           FROM m1 JOIN s2 ON m1.id <> s2.id
           JOIN d ON d.ia = m1.id AND d.ib = s2.id),
    s3 AS (SELECT id, mind FROM m2 ORDER BY mind DESC, id ASC LIMIT 1),
    m3 AS (SELECT m2.id, least(m2.mind, d.d2) AS mind
           FROM m2 JOIN s3 ON m2.id <> s3.id
           JOIN d ON d.ia = m2.id AND d.ib = s3.id),
    s4 AS (SELECT id, mind FROM m3 ORDER BY mind DESC, id ASC LIMIT 1)
    SELECT id, CAST(0 AS BIGINT) AS sel_order,
           CAST(NULL AS BIGINT) AS dist_sq FROM s0
    UNION ALL SELECT id, 1, mind FROM s1
    UNION ALL SELECT id, 2, mind FROM s2
    UNION ALL SELECT id, 3, mind FROM s3
    UNION ALL SELECT id, 4, mind FROM s4
    """,
)
def kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center coreset gate (`dataprep.kcenter_select`): greedy
    farthest-point traversal (k=5) over 40 quantized embedding
    candidates. The oracle UNROLLS the greedy recurrence as relational
    argmax stages (the `mmr_diverse_topk` discipline) — a fully
    independent derivation of every pick and its max-min distance."""
    from logstash_spark.operators.dataprep import kcenter_select  # noqa: PLC0415

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 40
    )
    return kcenter_select(emb, 5).select(
        F.col("vec_id").alias("id"), "sel_order", "dist_sq"
    )


@query(
    "heaps_vocab_growth",
    """
    WITH ranked AS (
      SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS r
      FROM documents
    ),
    toks AS (
      SELECT r, t
      FROM (SELECT r, unnest(string_split(text, ' ')) AS t FROM ranked)
      WHERE t <> ''
    ),
    fst AS (SELECT t, min(r) AS fr FROM toks GROUP BY t),
    cnts AS (
      SELECT r,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) AS n
      FROM ranked
    ),
    cp(c) AS (VALUES (64), (128), (256), (500))
    SELECT CAST(c AS BIGINT) AS checkpoint_docs,
           (SELECT CAST(coalesce(sum(CASE WHEN r <= c THEN n ELSE 0 END), 0)
                        AS BIGINT) FROM cnts) AS tokens_cum,
           (SELECT CAST(count(*) AS BIGINT) FROM fst WHERE fr <= c)
             AS types_cum,
           CASE WHEN (SELECT sum(CASE WHEN r <= c THEN n ELSE 0 END)
                      FROM cnts) > 0 THEN
             CAST((SELECT count(*) FROM fst WHERE fr <= c) * 1000000
                  // (SELECT sum(CASE WHEN r <= c THEN n ELSE 0 END)
                      FROM cnts) AS BIGINT)
           END AS types_ppm_of_tokens
    FROM cp
    """,
)
def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law gate (`dataprep.heaps_growth`): distinct-type counts
    within the first {64,128,256,500} documents of the id-ordered
    stream, with cumulative token totals and the exact types-per-token
    ppm. The oracle re-derives first-occurrence ranks and every
    checkpoint sum independently."""
    from logstash_spark.operators.dataprep import heaps_growth  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return heaps_growth(docs, [64, 128, 256, 500])

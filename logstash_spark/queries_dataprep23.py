"""Correctness-gate queries, dataprep batch 23 (round 3): int8-quantized
ANN search and the per-column field-coverage profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# ann_cosine_topk_int8
# ---------------------------------------------------------------------------

_QZ = (
    "CASE WHEN list_max(list_transform({v}, x -> abs(x))) > 0 "
    "THEN list_transform({v}, x -> CAST(floor(x * 127.0 "
    "/ list_max(list_transform({v}, y -> abs(y))) + 0.5) AS BIGINT)) "
    "ELSE list_transform({v}, x -> CAST(0 AS BIGINT)) END"
)


@query(
    "ann_cosine_topk_int8",
    f"""
    WITH z AS (
      SELECT vec_id, {_QZ.format(v="embedding")} AS q FROM embeddings
    ),
    n AS (
      SELECT vec_id, q,
             list_sum(list_transform(q, x -> x * x)) AS n2
      FROM z
    ),
    nn AS (SELECT * FROM n WHERE n2 > 0),
    qs AS (SELECT vec_id AS q_id, q AS qq, n2 AS qn2 FROM nn WHERE vec_id < 5),
    s AS (
      SELECT q_id, c.vec_id AS c_id,
             round(list_sum(list_transform(list_zip(qq, c.q),
                     p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT)))
                   / sqrt(CAST(qn2 * c.n2 AS DOUBLE)), 6) AS cos_q6
      FROM qs, nn c WHERE q_id != c.vec_id
    )
    SELECT q_id, c_id, cos_q6, CAST(rank AS INTEGER) AS rank
    FROM (SELECT q_id, c_id, cos_q6,
                 row_number() OVER (PARTITION BY q_id
                                    ORDER BY cos_q6 DESC, c_id) AS rank
          FROM s)
    WHERE rank <= 5
    """,
)
def ann_cosine_topk_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-ANN gate (`dataprep.ann_topk_int8`): brute-force top-5
    over the REAL embeddings table with both sides int8-quantized — the
    per-vector scales cancel in the cosine, so the score is a pure
    function of int64 terms (one double sqrt at the end, ranked at 6
    dp). Proves the 4x-compressed search path end to end."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return D.ann_topk_int8(em, em.where(F.col("vec_id") < 5), k=5)


# ---------------------------------------------------------------------------
# field_coverage
# ---------------------------------------------------------------------------

@query(
    "field_coverage",
    """
    WITH v AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
             CASE WHEN doc_id % 5 = 0 THEN '  ' ELSE source END AS source,
             CAST(n_chars AS VARCHAR) AS n_chars_s
      FROM documents
    ),
    u AS (
      SELECT 'lang' AS col, lang AS val FROM v
      UNION ALL SELECT 'source', source FROM v
      UNION ALL SELECT 'n_chars_s', n_chars_s FROM v
    )
    SELECT col,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(sum(CASE WHEN val IS NOT NULL AND trim(val) = ''
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
           CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
           CAST(((count(*) - sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END))
                 * 1000000) // count(*) AS BIGINT) AS coverage_ppm
    FROM u GROUP BY col
    """,
)
def field_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-profile gate (`dataprep.field_coverage_profile`): documents
    with injected nulls (every 7th lang) and blanks (every 5th source)
    profiled in one explode+groupBy pass. Oracle is an independent
    UNION-ALL per-column aggregation."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    v = docs.select(
        F.when(i % 7 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
        F.when(i % 5 == 0, F.lit("  ")).otherwise(F.col("source")).alias(
            "source"
        ),
        F.col("n_chars").cast("string").alias("n_chars_s"),
    )
    return D.field_coverage_profile(v, ["lang", "source", "n_chars_s"])

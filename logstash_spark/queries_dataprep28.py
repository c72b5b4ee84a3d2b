"""Correctness-gate queries, dataprep batch 28 (round 3): PR-curve
threshold sweep and Cohen's kappa. Both oracles are independent
relational derivations (direct conditional counts per threshold;
marginal-product expectation for kappa).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "pr_threshold_sweep",
    f"""
    WITH s AS (
      SELECT doc_id,
             ({_H32.format(s="doc_id || ':sc'")} % 50)
               + CASE WHEN {_H32.format(s="doc_id || ':lb'")} % 3 = 0
                      THEN 20 ELSE 0 END AS score,
             ({_H32.format(s="doc_id || ':lb'")} % 3 = 0) AS label
      FROM documents
    ),
    th AS (SELECT DISTINCT score AS threshold FROM s),
    m AS (
      SELECT th.threshold,
             CAST(sum(CASE WHEN s.score >= th.threshold AND s.label
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(sum(CASE WHEN s.score >= th.threshold AND NOT s.label
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(sum(CASE WHEN s.score < th.threshold AND s.label
                           THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(sum(CASE WHEN s.label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos
      FROM th, s GROUP BY th.threshold
    )
    SELECT threshold, tp, fp, fn,
           CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS precision_ppm,
           CAST(CASE WHEN n_pos > 0 THEN (tp * 1000000) // n_pos
                     ELSE 0 END AS BIGINT) AS recall_ppm,
           CAST(CASE WHEN n_pos + tp + fp > 0
                     THEN (2 * tp * 1000000) // (n_pos + tp + fp)
                     ELSE 0 END AS BIGINT) AS f1_ppm
    FROM m
    """,
)
def pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR-sweep gate (`dataprep.pr_curve`): the same scored corpus as
    `auc_exact`, one operating point per distinct score. The operator
    derives tp/fp via suffix windows over the score grid; the oracle
    recounts each threshold DIRECTLY with conditional sums over the raw
    rows — independent derivations, exact ppm."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = lambda tag: D.portable_hash32(  # noqa: E731
        F.concat(F.col("doc_id").cast("string"), F.lit(tag))
    )
    scored = docs.select(
        (
            (h(":sc") % 50)
            + F.when(h(":lb") % 3 == 0, F.lit(20)).otherwise(F.lit(0))
        ).alias("score"),
        (h(":lb") % 3 == 0).alias("label"),
    )
    return D.pr_curve(scored)


@query(
    "annotator_kappa",
    f"""
    WITH r AS (
      SELECT doc_id,
             'l' || ({_H32.format(s="doc_id || ':ra'")} % 3) AS rater_a,
             CASE WHEN {_H32.format(s="doc_id || ':noise'")} % 4 = 0
                  THEN 'l' || ({_H32.format(s="doc_id || ':rb'")} % 3)
                  ELSE 'l' || ({_H32.format(s="doc_id || ':ra'")} % 3)
             END AS rater_b
      FROM documents
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM r),
    agree AS (
      SELECT CAST(sum(CASE WHEN rater_a = rater_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS agree FROM r
    ),
    pe AS (
      SELECT CAST(sum(am.c * bm.c) AS BIGINT) AS pe
      FROM (SELECT rater_a AS l, count(*) AS c FROM r GROUP BY 1) am
      JOIN (SELECT rater_b AS l, count(*) AS c FROM r GROUP BY 1) bm
        ON am.l = bm.l
    )
    SELECT n_items,
           CAST((agree * 1000000) // n_items AS BIGINT) AS agree_ppm,
           CAST(((n_items * agree - pe) * 1000000)
                // (n_items * n_items - pe) AS BIGINT) AS kappa_ppm
    FROM n, agree, pe
    """,
)
def annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kappa gate (`dataprep.cohens_kappa`): two simulated raters over
    3 labels — rater B copies A except on a 25% noise slice, so kappa
    sits well above chance but below 1. The oracle derives the
    expected-agreement term from the marginal product independently."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = lambda tag: D.portable_hash32(  # noqa: E731
        F.concat(F.col("doc_id").cast("string"), F.lit(tag))
    )
    la = F.concat(F.lit("l"), (h(":ra") % 3).cast("string"))
    lb = F.when(
        h(":noise") % 4 == 0,
        F.concat(F.lit("l"), (h(":rb") % 3).cast("string")),
    ).otherwise(la)
    rated = docs.select(la.alias("rater_a"), lb.alias("rater_b"))
    return D.cohens_kappa(rated)

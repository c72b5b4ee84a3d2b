"""Correctness-gate queries, dataprep batch 27 (round 3): exact-integer
AUC and word2vec negative sampling. The AUC oracle uses the PAIRWISE
definition (count pos>neg and pos=neg pairs directly) while the operator
uses the rank formula — two mathematically equivalent but entirely
different derivations that must agree to the ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "auc_exact",
    f"""
    WITH s AS (
      SELECT doc_id,
             ({_H32.format(s="doc_id || ':sc'")} % 50)
               + CASE WHEN {_H32.format(s="doc_id || ':lb'")} % 3 = 0
                      THEN 20 ELSE 0 END AS score,
             ({_H32.format(s="doc_id || ':lb'")} % 3 = 0) AS label
      FROM documents
    ),
    p AS (SELECT score FROM s WHERE label),
    n AS (SELECT score FROM s WHERE NOT label),
    pairs AS (
      SELECT CAST(sum(CASE WHEN p.score > n.score THEN 2
                           WHEN p.score = n.score THEN 1
                           ELSE 0 END) AS BIGINT) AS two_gt
      FROM p, n
    )
    SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pos,
           CAST((SELECT count(*) FROM n) AS BIGINT) AS n_neg,
           CAST((two_gt * 1000000)
                // (2 * (SELECT count(*) FROM p)
                      * (SELECT count(*) FROM n)) AS BIGINT) AS auc_ppm
    FROM pairs
    """,
)
def auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC gate (`dataprep.auc_binary`): hash-derived scores where
    positives get a +20 shift (so AUC is meaningfully above chance with
    real ties). The operator computes the Mann-Whitney rank formula in
    one small groupBy(score)+window; the oracle counts the 60k
    positive×negative pairs DIRECTLY — an independent derivation of the
    same statistic, exact to the ppm."""
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
    return D.auc_binary(scored)


@query(
    "negative_sampling",
    f"""
    WITH vocab AS (
      SELECT 'w' || i AS word, CAST((i + 1) * (i + 1) AS BIGINT) AS cnt
      FROM (SELECT unnest(range(0, 20)) AS i)
    ),
    wt AS (
      SELECT word, cnt,
             CAST(floor(sqrt(floor(sqrt(CAST(cnt AS DOUBLE)
                  * cnt * cnt)))) AS BIGINT) AS w
      FROM vocab
    ),
    t AS (
      SELECT word, cnt, w,
             CAST(coalesce(sum(w) OVER (ORDER BY cnt DESC, word ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS lo
      FROM wt WHERE w > 0
    ),
    tt AS (SELECT *, lo + w AS hi FROM t),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM tt),
    slots AS (
      SELECT doc_id AS pair_id, CAST(js.j AS INT) AS slot,
             {_H32.format(s="doc_id || ':' || js.j || ':neg'")}
               % (SELECT tw FROM tot) AS u
      FROM documents, (SELECT unnest(range(0, 3)) AS j) js
      WHERE doc_id < 200
    )
    SELECT pair_id, slot, word AS negative
    FROM slots JOIN tt ON u >= lo AND u < hi
    """,
)
def negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-sampling gate (`dataprep.negative_sampling_table` +
    `sample_negatives`): a 20-word quadratic-count vocab, weights =
    exact integer count^(3/4) via two floor-sqrts, 3 negatives per
    positive pair drawn deterministically through the range join. The
    oracle rebuilds table + draws in SQL."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab = spark.range(0, 20).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("word"),
        ((F.col("id") + 1) * (F.col("id") + 1)).cast("long").alias("cnt"),
    )
    table = D.negative_sampling_table(vocab)
    pairs = docs.where(F.col("doc_id") < 200).select(
        F.col("doc_id").alias("pair_id")
    )
    return D.sample_negatives(pairs, table, k=3)

"""Correctness-gate queries, dataprep batch 16 (round 3): post-training
eval/selection — pass@k estimation, self-consistency majority vote,
pairwise win-rate matrix. All three oracles are INDEPENDENT relational
derivations (list_reduce products / window tie-breaks / plain
conditional aggregation), not replays of the operator's expression tree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


def _h32(c: F.Column) -> F.Column:
    from logstash_spark.operators.dataprep import portable_hash32  # noqa: PLC0415

    return portable_hash32(c)


# ---------------------------------------------------------------------------
# pass_at_k_estimator
# ---------------------------------------------------------------------------

@query(
    "pass_at_k_estimator",
    f"""
    WITH s AS (
      SELECT doc_id // 8 AS problem_id,
             CASE WHEN {_H32.format(s="doc_id || ':pk'")} % 3 = 0
                  THEN 1 ELSE 0 END AS correct
      FROM documents
    ),
    g AS (
      SELECT problem_id, CAST(count(*) AS BIGINT) AS n_samples,
             CAST(sum(correct) AS BIGINT) AS n_correct
      FROM s GROUP BY 1
    ),
    e AS (
      SELECT g.*, CAST(ks.k AS BIGINT) AS k,
             least(CAST(ks.k AS BIGINT), n_samples) AS kk
      FROM g, (SELECT unnest([1, 2, 4, 8]) AS k) ks
    )
    SELECT problem_id, n_samples, n_correct, k,
           CAST(1000000 - (1000000 * list_reduce(
                  list_transform(range(0, kk),
                    i -> n_samples - n_correct - i),
                  (a, x) -> a * x))
                // list_reduce(
                  list_transform(range(0, kk), i -> n_samples - i),
                  (a, x) -> a * x) AS BIGINT) AS pass_ppm
    FROM e
    """,
)
def pass_at_k_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k gate (`dataprep.pass_at_k`): 8-sample problems with
    hash-derived correctness, estimated at k in {1,2,4,8} — the
    HumanEval unbiased estimator in exact integer ppm. The oracle
    derives the combinatorial products independently with DuckDB
    list_reduce (BIGINT end to end, no float)."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    samples = docs.select(
        F.expr("doc_id DIV 8").alias("problem_id"),
        (
            _h32(F.concat(F.col("doc_id").cast("string"), F.lit(":pk"))) % 3
            == 0
        ).alias("correct"),
    )
    return D.pass_at_k(samples, ks=(1, 2, 4, 8))


# ---------------------------------------------------------------------------
# majority_vote_answers
# ---------------------------------------------------------------------------

@query(
    "majority_vote_answers",
    f"""
    WITH s AS (
      SELECT doc_id // 8 AS prompt_id,
             'ans' || ({_H32.format(s="doc_id || ':mv'")} % 5) AS answer
      FROM documents
    ),
    c AS (
      SELECT prompt_id, answer, CAST(count(*) AS BIGINT) AS v
      FROM s GROUP BY 1, 2
    ),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY prompt_id ORDER BY v DESC, answer ASC
             ) AS rn,
             CAST(sum(v) OVER (PARTITION BY prompt_id) AS BIGINT)
               AS n_votes,
             CAST(count(*) OVER (PARTITION BY prompt_id) AS BIGINT)
               AS n_distinct_answers
      FROM c
    )
    SELECT prompt_id, answer AS majority_answer, v AS majority_votes,
           n_votes, n_distinct_answers,
           CAST((v * 1000000) // n_votes AS BIGINT) AS share_ppm
    FROM r WHERE rn = 1
    """,
)
def majority_vote_answers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-consistency gate (`dataprep.majority_vote`): 8 sampled
    answers per prompt drawn from 5 hash-derived candidates, plurality
    winner with answer-ASC tie-break and exact ppm share. The oracle
    uses a window row_number derivation — the operator's min(struct)
    pick must agree with the relational definition."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    samples = docs.select(
        F.expr("doc_id DIV 8").alias("prompt_id"),
        F.concat(
            F.lit("ans"),
            (
                _h32(F.concat(F.col("doc_id").cast("string"), F.lit(":mv")))
                % 5
            ).cast("string"),
        ).alias("answer"),
    )
    return D.majority_vote(samples)


# ---------------------------------------------------------------------------
# pairwise_win_rates
# ---------------------------------------------------------------------------

@query(
    "pairwise_win_rates",
    f"""
    WITH s AS (
      SELECT 'm' || (doc_id % 5) AS model_a,
             'm' || ((doc_id * 3 + 1) % 5) AS model_b,
             CASE {_H32.format(s="doc_id || ':wr'")} % 4
               WHEN 0 THEN 'a' WHEN 1 THEN 'b'
               WHEN 2 THEN 'a' ELSE 'tie' END AS winner
      FROM documents
      WHERE (doc_id % 5) != ((doc_id * 3 + 1) % 5)
    ),
    c AS (
      SELECT least(model_a, model_b) AS model_lo,
             greatest(model_a, model_b) AS model_hi,
             CASE WHEN (winner = 'a' AND model_a <= model_b)
                    OR (winner = 'b' AND model_b < model_a)
                  THEN 1 ELSE 0 END AS lo_w,
             CASE WHEN (winner = 'a' AND model_a > model_b)
                    OR (winner = 'b' AND model_b >= model_a)
                  THEN 1 ELSE 0 END AS hi_w,
             CASE WHEN winner = 'tie' THEN 1 ELSE 0 END AS t
      FROM s
    )
    SELECT model_lo, model_hi,
           CAST(sum(lo_w) AS BIGINT) AS wins_lo,
           CAST(sum(hi_w) AS BIGINT) AS wins_hi,
           CAST(sum(t) AS BIGINT) AS ties,
           CAST(count(*) AS BIGINT) AS games,
           CAST(((2 * sum(lo_w) + sum(t)) * 1000000)
                // (2 * count(*)) AS BIGINT) AS lo_win_ppm
    FROM c GROUP BY 1, 2
    """,
)
def pairwise_win_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win-rate-matrix gate (`dataprep.win_rate_matrix`): hash-derived
    head-to-head outcomes over 5 models (winner 'a' twice as likely as
    'b', plus ties), canonicalized to unordered pairs with half-win tie
    accounting in exact ppm. Independent conditional-aggregation
    oracle."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    comps = docs.select(
        F.concat(F.lit("m"), (F.col("doc_id") % 5).cast("string")).alias(
            "model_a"
        ),
        F.concat(
            F.lit("m"), ((F.col("doc_id") * 3 + 1) % 5).cast("string")
        ).alias("model_b"),
        F.when(
            _h32(F.concat(F.col("doc_id").cast("string"), F.lit(":wr"))) % 4
            == 3,
            F.lit("tie"),
        )
        .when(
            _h32(F.concat(F.col("doc_id").cast("string"), F.lit(":wr"))) % 4
            == 1,
            F.lit("b"),
        )
        .otherwise(F.lit("a"))
        .alias("winner"),
    ).where(F.col("model_a") != F.col("model_b"))
    return D.win_rate_matrix(comps)

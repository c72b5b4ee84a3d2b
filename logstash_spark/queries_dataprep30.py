"""Correctness-gate queries, dataprep batch 30 (round 3): GRPO-style
group-relative advantage and the SQuAD-style generation-eval triple
(exact match / levenshtein similarity / token F1). The advantage
oracle re-derives the group moments with window functions; the eval
oracle replays the full normalization + overlap machinery with DuckDB
list functions and the built-in levenshtein.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

_NORM = (
    "list_filter(string_split(regexp_replace(lower({s}), '[^a-z0-9]+', ' ', "
    "'g'), ' '), x -> x <> '' AND x NOT IN ('a','an','the'))"
)


@query(
    "grpo_group_advantage",
    f"""
    WITH base AS (
      SELECT doc_id, doc_id // 8 AS group_id,
             CAST({_H32.format(s="doc_id || ':rw'")} % 21 - 10 AS BIGINT)
               AS reward
      FROM documents
    ),
    g AS (
      SELECT doc_id, group_id, reward,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(reward) OVER w AS BIGINT) AS s,
             CAST(sum(reward * reward) OVER w AS BIGINT) AS q
      FROM base WINDOW w AS (PARTITION BY group_id)
    )
    SELECT doc_id, group_id, reward, n,
           CAST(floor((reward * n - s) * 1000000.0 / n) AS BIGINT)
             AS adv_mean_ppm,
           CAST(CASE WHEN n * q - s * s > 0
                     THEN floor((reward * n - s) * 1000000.0
                                / sqrt(CAST(n * q - s * s AS DOUBLE)))
                     ELSE 0 END AS BIGINT) AS adv_z_ppm
    FROM g
    """,
)
def grpo_group_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advantage gate (`dataprep.grpo_advantage`): 8-sample groups with
    hash-derived integer rewards in [-10, 10] — negative numerators
    exercise the floor-of-double (not integer-div) path on both
    engines. Group moments are exact int64; the only rounding is the
    single final floor."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    base = docs.select(
        "doc_id",
        F.expr("doc_id DIV 8").alias("group_id"),
        (
            D.portable_hash32(F.concat(i.cast("string"), F.lit(":rw"))) % 21
            - 10
        ).cast("long").alias("reward"),
    )
    return D.grpo_advantage(base, group_col="group_id", reward_col="reward")


@query(
    "eval_em_f1",
    f"""
    WITH base AS (
      SELECT doc_id,
             substr(text, 1, 64) AS ref,
             CASE {_H32.format(s="doc_id || ':ev'")} % 4
               WHEN 0 THEN substr(text, 1, 64)
               WHEN 1 THEN substr(text, 1, 48)
               WHEN 2 THEN substr(text, 9, 56)
               ELSE substr(text, 1, 40) || ' the extra answer' END AS pred
      FROM documents
    ),
    toks AS (
      SELECT doc_id,
             {_NORM.format(s="pred")} AS pt,
             {_NORM.format(s="ref")} AS rt
      FROM base
    ),
    m AS (
      SELECT doc_id,
             array_to_string(pt, ' ') AS ps,
             array_to_string(rt, ' ') AS rs,
             CAST(len(pt) AS BIGINT) AS np,
             CAST(len(rt) AS BIGINT) AS nr,
             CAST(coalesce(list_sum(list_transform(list_distinct(pt),
               x -> least(len(list_filter(pt, y -> y = x)),
                          len(list_filter(rt, y -> y = x))))), 0) AS BIGINT)
               AS ov
      FROM toks
    )
    SELECT doc_id,
           CAST(ps = rs AS INT) AS exact_match,
           CAST(CASE WHEN greatest(length(ps), length(rs)) > 0
                THEN ((greatest(length(ps), length(rs))
                       - levenshtein(ps, rs)) * 1000000)
                     // greatest(length(ps), length(rs))
                ELSE 1000000 END AS BIGINT) AS lev_sim_ppm,
           CAST(CASE WHEN np + nr > 0
                THEN (2 * ov * 1000000) // (np + nr)
                ELSE 1000000 END AS BIGINT) AS token_f1_ppm
    FROM m
    """,
)
def eval_em_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generation-eval gate (`dataprep.eval_text_match`): predictions
    synthesized from each document by hash-selected corruption (exact
    copy / truncation / shifted window / appended junk), judged against
    the 64-char reference prefix. Normalization, levenshtein, and the
    token-multiset overlap replay independently in DuckDB."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = D.portable_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit(":ev"))
    ) % 4
    base = docs.select(
        "doc_id",
        F.substring("text", 1, 64).alias("ref"),
        F.when(h == 0, F.substring("text", 1, 64))
        .when(h == 1, F.substring("text", 1, 48))
        .when(h == 2, F.substring("text", 9, 56))
        .otherwise(F.concat(F.substring("text", 1, 40), F.lit(" the extra answer")))
        .alias("pred"),
    )
    return D.eval_text_match(base).select(
        "doc_id", "exact_match", "lev_sim_ppm", "token_f1_ppm"
    )

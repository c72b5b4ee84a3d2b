"""Correctness-gate queries, dataprep batch 11 (round 3): SFT loss
masking, best-of-N selection, per-source epoch replication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logstash_spark.queries import query

_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"

_TOK_N = "(doc_id % 37) + 3"
_TOK_SQL = (
    f"list_transform(range(0, {_TOK_N}), "
    "i -> CAST((doc_id * 7 + i * 13) % 50000 AS INTEGER))"
)


@query(
    "sft_loss_mask",
    f"""
    WITH d AS (
      SELECT doc_id, CAST({_TOK_N} AS INT) AS n, {_TOK_SQL} AS t,
             CAST(doc_id % 45 AS INT) AS prompt_len
      FROM documents
    ),
    m AS (
      SELECT doc_id, prompt_len,
             list_transform(range(1, n + 1),
               i -> CASE WHEN i <= prompt_len THEN -100 ELSE t[i] END)
               AS labels,
             least(greatest(prompt_len, 0), n) AS n_masked,
             n - least(greatest(prompt_len, 0), n) AS n_trainable
      FROM d
    )
    SELECT doc_id, prompt_len,
           md5(coalesce(array_to_string(labels, ','), '')) AS labels_md5,
           CAST(n_masked AS INT) AS n_masked,
           CAST(n_trainable AS INT) AS n_trainable
    FROM m
    """,
)
def sft_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT prompt-masking gate (`dataprep.sft_loss_mask`): labels copy
    the token array with the first prompt_len positions replaced by
    -100 (cross-entropy ignore_index). prompt_len here deliberately
    overruns n for some docs (doc_id % 45 vs n ≤ 39) to pin the
    mask-everything edge. md5-canonicalized label arrays (driver
    convention); raw arrays in unit tests."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 37 + 3).cast("int")
    toks = FN.transform(
        FN.sequence(FN.lit(0), n - 1),
        lambda i: ((FN.col("doc_id") * 7 + i * 13) % 50000).cast("int"),
    )
    src = docs.select(
        "doc_id",
        toks.alias("tokens"),
        (FN.col("doc_id") % 45).cast("int").alias("prompt_len"),
    )
    out = D.sft_loss_mask(src)
    return out.select(
        "doc_id",
        "prompt_len",
        FN.md5(
            FN.concat_ws(",", FN.col("labels").cast("array<string>"))
        ).alias("labels_md5"),
        "n_masked",
        "n_trainable",
    )


@query(
    "best_of_n_select",
    """
    WITH c AS (
      SELECT doc_id,
             CAST(doc_id % 50 AS BIGINT) AS prompt_id,
             CAST(n_chars * 10 + doc_id % 13 AS BIGINT) AS score
      FROM documents
    )
    SELECT doc_id, prompt_id, score,
           CAST(row_number() OVER (PARTITION BY prompt_id
                                   ORDER BY score DESC, doc_id) AS INT)
             AS candidate_rank,
           row_number() OVER (PARTITION BY prompt_id
                              ORDER BY score DESC, doc_id) <= 2 AS bon_keep
    FROM c
    """,
)
def best_of_n_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-N gate (`dataprep.best_of_n`; Llama 2 §3.2.2 rejection
    sampling): top-2 candidates per prompt group by score, id
    tie-breaks. ONE bounded per-group window."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cand = docs.select(
        "doc_id",
        (FN.col("doc_id") % 50).cast("bigint").alias("prompt_id"),
        (FN.col("n_chars") * 10 + FN.col("doc_id") % 13)
        .cast("bigint")
        .alias("score"),
    )
    out = D.best_of_n(cand, keep_n=2)
    return out.select(
        "doc_id", "prompt_id", "score", "candidate_rank", "bon_keep"
    )


@query(
    "epoch_replication",
    f"""
    WITH e AS (
      SELECT doc_id, source,
             CASE WHEN source = 'src0' THEN 24500
                  WHEN source = 'src1' THEN 8000
                  ELSE 10000 END AS bp,
             {_H32.format(x="CAST(doc_id AS VARCHAR) || ':epoch'")} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source,
             CAST(bp // 10000
                  + CASE WHEN h % 10000 < bp % 10000 THEN 1 ELSE 0 END
               AS INT) AS copies
      FROM e
    )
    SELECT doc_id, source, CAST(unnest(range(0, copies)) AS INT) AS epoch_idx
    FROM c WHERE copies > 0
    """,
)
def epoch_replication(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-replication gate (`dataprep.epoch_replicate`; the LLaMA
    data-recipe 'epochs' column): src0 at 2.45 epochs (every doc twice,
    an md5-selected 45% a third time), src1 downsampled to 0.8 epochs,
    everything else exactly once. Map-side posexplode, zero shuffle;
    expected row count per source = n_s·e_s."""
    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.epoch_replicate(
        docs.select("doc_id", "source"),
        epochs_bp={"src0": 24500, "src1": 8000},
    )
    return out.select("doc_id", "source", "epoch_idx")

"""Correctness-gate queries, dataprep batch 22 (round 3): int8
embedding quantization over the real embeddings table. The oracle
replays the floor(+0.5) quantizer with DuckDB list functions — both
engines read the identical IEEE doubles from parquet, so every
arithmetic step is bit-identical by construction (the op deliberately
avoids round(), whose tie-breaking differs across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


@query(
    "embedding_int8_quant",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding, x -> abs(x))) AS scale
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
             CASE WHEN scale > 0
                  THEN list_transform(embedding,
                         x -> CAST(floor(x * 127.0 / scale + 0.5) AS INT))
                  ELSE list_transform(embedding, x -> 0) END AS q
      FROM m
    )
    SELECT vec_id,
           md5(array_to_string(q, ',')) AS q_md5,
           CAST(list_min(q) AS BIGINT) AS q_min,
           CAST(list_max(q) AS BIGINT) AS q_max,
           round(scale, 6) AS scale_r6,
           CAST(len(q) AS BIGINT) AS n_dim
    FROM q
    """,
)
def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantization gate (`dataprep.quantize_embedding_int8`) over
    the REAL embeddings table: per-vector symmetric scale, q in
    [-127, 127], md5 of the full quantized array plus min/max probes.
    Zero shuffle — scan + map."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feats = D.quantize_embedding_int8(F.col("embedding"))
    q = feats["q"]
    return em.select(
        "vec_id",
        F.md5(F.concat_ws(",", F.transform(q, lambda x: x.cast("string")))).alias(
            "q_md5"
        ),
        F.array_min(q).cast("long").alias("q_min"),
        F.array_max(q).cast("long").alias("q_max"),
        F.round(feats["scale"], 6).alias("scale_r6"),
        feats["n_dim"].alias("n_dim"),
    )

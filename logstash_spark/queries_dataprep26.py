"""Correctness-gate queries, dataprep batch 26 (round 3): canary
injection + detection (the memorization probe), end to end: plant →
simulate a leaky model that regurgitates every third planted canary →
detect → per-canary verdict. The oracle derives the whole chain in
closed form from doc_id (selection hash, canary body, leak rule) —
it never runs the extraction regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "canary_extraction",
    f"""
    WITH planted AS (
      SELECT doc_id,
             'CANARY-' || substr(md5(doc_id || ':mem:c'), 1, 12) AS canary
      FROM documents
      WHERE {_H32.format(s="doc_id || ':mem'")} % 1000000 < 200000
    )
    SELECT canary,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_hits,
           (doc_id % 3 = 0) AS extracted
    FROM planted
    """,
)
def canary_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary gate (`dataprep.inject_canaries` + `detect_canaries`):
    canaries planted into 20% of documents, a simulated leaky model
    emits every third planted doc's canary inside generated text, and
    detection must recover exactly those — per-canary hit counts and
    extraction verdicts. The oracle states the expected outcome in
    closed form from doc_id without running the regex: any drift in
    selection hashing, canary derivation, extraction, or the join
    breaks the hash match."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = D.inject_canaries(docs, rate_ppm=200_000, seed="mem")
    registry = planted.where(F.col("canary").isNotNull()).select(
        "doc_id", "canary"
    )
    # a "model" that regurgitates every third planted canary inside
    # otherwise-novel generations
    generated = registry.where(F.col("doc_id") % 3 == 0).select(
        F.concat(
            F.lit("model output mentions "),
            F.col("canary"),
            F.lit(" verbatim"),
        ).alias("text")
    )
    return D.detect_canaries(generated, registry)

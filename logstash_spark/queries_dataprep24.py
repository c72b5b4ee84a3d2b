"""Correctness-gate queries, dataprep batch 24 (round 3): group-aware
split assignment — the eval-leakage guard. The oracle replays the
cumulative-threshold arithmetic AND independently asserts the guarantee
itself: the per-cluster distinct-split count is part of the gated
output, so a leaky assignment cannot hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "leakage_safe_split",
    f"""
    WITH d AS (
      SELECT doc_id, doc_id % 120 AS cluster,
             {_H32.format(s="(doc_id % 120) || ':split'")} % 1000000 AS u
      FROM documents
    ),
    s AS (
      SELECT doc_id, cluster,
             CASE WHEN u < 900000 THEN 'train'
                  WHEN u < 950000 THEN 'val'
                  ELSE 'test' END AS split
      FROM d
    ),
    g AS (
      SELECT cluster, split,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT split)
                    OVER (PARTITION BY cluster) AS BIGINT)
               AS splits_in_cluster
      FROM s GROUP BY cluster, split
    )
    SELECT cluster, split, n_docs, splits_in_cluster FROM g
    """,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe-split gate (`dataprep.grouped_split`): documents
    carry a synthetic dedup-cluster id; splits are assigned by hashing
    the CLUSTER, and the gated output includes each cluster's distinct-
    split count — which the oracle states must equal 1 per cluster by
    construction, so any row-level (leaky) assignment breaks the hash
    match, not just a unit test."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clustered = docs.select(
        "doc_id", (F.col("doc_id") % 120).alias("cluster")
    )
    split = D.grouped_split(clustered, group_col="cluster")
    g = split.groupBy("cluster", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    from pyspark.sql.window import Window  # noqa: PLC0415

    w = Window.partitionBy("cluster")
    return g.withColumn(
        "splits_in_cluster",
        F.size(F.collect_set("split").over(w)).cast("long"),
    )

"""Correctness-gate queries, dataprep batch 13 (round 3): padding-aware
length-bucketed batching, the shuffle-key skew report, and the
storage-bucketed co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logstash_spark.queries import query

# the deterministic 32-bit hash both engines replay (dataprep
# portable_hash32): int(md5(s)[:8], 16)
_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


@query(
    "length_bucket_batching",
    f"""
    WITH d AS (
      SELECT doc_id, n_chars AS n_tok,
             CASE WHEN n_chars <= 0 THEN 0
                  ELSE length(bin(n_chars)) END AS bucket,
             {_H32.format(s="doc_id || ':lbshard'")} % 4 AS lb_shard
      FROM documents
    ),
    b AS (
      SELECT *,
             CAST((row_number() OVER (PARTITION BY bucket, lb_shard
                                      ORDER BY n_tok DESC, doc_id ASC) - 1)
                  // 8 AS BIGINT) AS batch_id
      FROM d
    )
    SELECT CAST(bucket AS INT) AS bucket, CAST(lb_shard AS INT) AS lb_shard,
           batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
    FROM b GROUP BY 1, 2, 3
    """,
)
def length_bucket_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching gate (`dataprep.length_bucket_batches` +
    `batch_pad_stats`): documents bucketed by bit-length of n_chars,
    sharded 4 ways by the portable hash, batches of 8 ordered longest-
    first, per-batch padding waste vs the batch max. ONE window shuffle
    + one same-key groupBy."""
    from pyspark.sql import functions as FN  # noqa: PLC0415

    from logstash_spark.operators.dataprep import (  # noqa: PLC0415
        batch_pad_stats,
        length_bucket_batches,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", FN.col("n_chars").alias("n_tok")
    )
    b = length_bucket_batches(docs, batch_size=8, n_shards=4)
    return batch_pad_stats(b).select(
        "bucket", "lb_shard", "batch_id", "n_docs", "max_tok", "sum_tok",
        "pad_waste",
    )


@query(
    "skew_report_hitters",
    """
    WITH c AS (
      SELECT coalesce(CAST(source AS VARCHAR), '<null>') AS key,
             CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1
    ),
    t AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys
      FROM c
    )
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS INT)
             AS rank,
           key, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS ppm,
           total, n_keys
    FROM c CROSS JOIN t
    ORDER BY cnt DESC, key ASC
    LIMIT 5
    """,
)
def skew_report_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic gate (`dataprep.skew_report`): top-5
    heavy hitters of documents.source with exact ppm share — the
    pre-flight read before keying a big shuffle on the column. groupBy
    partial-combine + TakeOrdered; no global sort."""
    from logstash_spark.operators.dataprep import skew_report  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return skew_report(docs, "source", top_k=5)


@query(
    "bucketed_join_colocated",
    """
    WITH a AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(min(event_id) AS BIGINT) AS first_event,
             CAST(max(event_id) AS BIGINT) AS last_event
      FROM events GROUP BY user_id
    ),
    b AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_errors,
             CAST(max(event_id) AS BIGINT) AS last_error
      FROM events WHERE event_type = 'error' GROUP BY user_id
    )
    SELECT a.user_id, n_events, first_event, last_event,
           n_errors, last_error
    FROM a JOIN b ON a.user_id = b.user_id
    """,
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-bucketing gate (`tableio.write_bucketed`): two per-user
    summary tables are WRITTEN hash-bucketed by user_id (8 buckets,
    sorted within buckets), then sort-merge joined through the catalog.
    Because both scans carry the same bucketing spec on the join key,
    the join plan has ZERO Exchange (pinned in
    tests/test_plan_shape.py) — the pay-the-shuffle-once-at-write-time
    pattern that makes every downstream join on the key free at 100 TB
    (Iceberg `bucket(N, key)` + storage-partitioned joins on a real
    cluster). The merge hint keeps the demo honest: without it a
    broadcast of the small side would also skip the exchange, but for
    the wrong (size-dependent) reason."""
    import hashlib  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from pyspark.sql import functions as FN  # noqa: PLC0415

    from logstash_spark.sources.tableio import write_bucketed  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.groupBy("user_id").agg(
        FN.count("*").alias("n_events"),
        FN.min("event_id").alias("first_event"),
        FN.max("event_id").alias("last_event"),
    )
    b = (
        ev.where(FN.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            FN.count("*").alias("n_errors"),
            FN.max("event_id").alias("last_error"),
        )
    )
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    root = f"{tempfile.gettempdir()}/bucketed_{tag}"
    ta = write_bucketed(
        a, f"bkt_user_stats_{tag}", f"{root}/a", buckets=8, key="user_id"
    )
    tb = write_bucketed(
        b, f"bkt_user_errors_{tag}", f"{root}/b", buckets=8, key="user_id"
    )
    return ta.hint("merge").join(tb.hint("merge"), "user_id").select(
        "user_id", "n_events", "first_event", "last_event",
        "n_errors", "last_error",
    )

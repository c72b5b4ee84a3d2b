"""Correctness-gate queries, batch 10 (round 3, late): gzip_lines codec
round trip. The blob under test is synthesized in-query (gzip_encode with
pinned mtime over deterministic per-doc content), so the DuckDB oracle can
recompute every decoded line from the documents table without needing a
gzip primitive of its own.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators.codec import gzip_encode, gzip_lines
from logstash_spark.queries import query


@query(
    "gzip_lines_codec",
    """
    SELECT d.doc_id,
           t.ln AS line_no,
           CASE t.ln
                WHEN 0 THEN 'id:' || CAST(d.doc_id AS VARCHAR)
                WHEN 1 THEN 'md5:' || md5(d.text)
                ELSE 'lang:' || d.lang
           END AS message
    FROM documents d
    CROSS JOIN (VALUES (0), (1), (2)) AS t(ln)
    ORDER BY d.doc_id, t.ln
    """,
)
def gzip_lines_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gzip_lines decode gate (reference: logstash-codec-gzip_lines
    §decode + logstash-output-file gzip option §flush): build a 3-line
    payload per document, deflate it with the deterministic gzip_encode
    (mtime=0), inflate + line-split it back through the gzip_lines op,
    and emit (doc_id, line_no, message). The oracle recomputes the three
    lines directly — any header, inflate, or split defect breaks the
    hash. Plan shape: two Arrow pandas-UDF projections + one posexplode,
    zero shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    payload = F.concat_ws(
        "\n",
        F.concat(F.lit("id:"), F.col("doc_id").cast("string")),
        F.concat(F.lit("md5:"), F.md5(F.col("text"))),
        F.concat(F.lit("lang:"), F.col("lang")),
    )
    blobs = gzip_encode(
        docs.select("doc_id", payload.alias("_payload")), "_payload"
    ).drop("_payload")
    decoded = gzip_lines(blobs, "gz_blob", keep_empty=True)
    return decoded.select("doc_id", "line_no", "message").orderBy(
        "doc_id", "line_no"
    )


@query(
    "punct_template_mining",
    """
    WITH msgs AS (
      SELECT event_id,
             CASE CAST(event_id % 3 AS INT)
                  WHEN 0 THEN 'GET /api/v' || CAST(user_id % 3 AS VARCHAR)
                       || '/users?id=' || CAST(event_id AS VARCHAR) || ' 200'
                  WHEN 1 THEN 'ERROR [pool-' || CAST(user_id % 10 AS VARCHAR)
                       || '-thread-' || CAST(event_id % 8 AS VARCHAR)
                       || '] timeout after ' || CAST(event_id % 500 AS VARCHAR)
                       || 'ms'
                  ELSE 'user=' || CAST(user_id AS VARCHAR) || ' action=login ok'
             END AS msg
      FROM events
    ),
    sig AS (
      SELECT event_id,
             regexp_replace(msg, '[a-zA-Z0-9 ]', '', 'g') AS punct_sig,
             CAST(length(msg) - length(replace(msg, ' ', '')) + 1 AS INT)
                 AS n_tokens
      FROM msgs
    )
    SELECT punct_sig, n_tokens,
           COUNT(*) AS template_count,
           MIN(event_id) AS canon_event_id
    FROM sig
    GROUP BY punct_sig, n_tokens
    ORDER BY punct_sig, n_tokens
    """,
)
def punct_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """punct filter + template mining (reference: logstash-filter-punct
    §filter — the gsub skeleton — used exactly as its README suggests:
    group identical skeletons to discover the printf sites emitting the
    logs; same idea as Drain/LogMine's coarse first pass). Three
    synthetic printf sites over the events table collapse to three
    (skeleton, token-count) templates; the gate checks the skeleton
    strings, per-template counts, and the canonical (min event_id)
    exemplar. Plan: pure column exprs + ONE groupBy shuffle with
    map-side partial aggregation — template count is bounded by distinct
    printf sites, not rows, so the reduce side is tiny at any corpus
    size."""
    from logstash_spark.functions import punct as _punct  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    eid, uid = F.col("event_id"), F.col("user_id")
    s = lambda c: c.cast("string")  # noqa: E731
    msg = (
        F.when(
            eid % 3 == 0,
            F.concat(
                F.lit("GET /api/v"), s(uid % 3),
                F.lit("/users?id="), s(eid), F.lit(" 200"),
            ),
        )
        .when(
            eid % 3 == 1,
            F.concat(
                F.lit("ERROR [pool-"), s(uid % 10),
                F.lit("-thread-"), s(eid % 8),
                F.lit("] timeout after "), s(eid % 500), F.lit("ms"),
            ),
        )
        .otherwise(
            F.concat(F.lit("user="), s(uid), F.lit(" action=login ok"))
        )
    )
    df = _punct(ev.withColumn("message", msg), "message", target="punct_sig")
    n_tokens = (
        F.length("message")
        - F.length(F.replace(F.col("message"), F.lit(" "), F.lit("")))
        + 1
    ).cast("int")
    return (
        df.withColumn("n_tokens", n_tokens)
        .groupBy("punct_sig", "n_tokens")
        .agg(
            F.count("*").alias("template_count"),
            F.min("event_id").alias("canon_event_id"),
        )
        .orderBy("punct_sig", "n_tokens")
    )

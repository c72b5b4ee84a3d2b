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

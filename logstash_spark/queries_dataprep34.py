"""Correctness-gate queries, dataprep batch 34 (round 4): corpus-version
vocabulary drift (JS divergence + type churn), the dedup audit histogram,
and boundary-preserving next-fit-decreasing packing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

# the deterministic 32-bit hash both engines replay (dataprep
# portable_hash32): int(md5(s)[:8], 16)
_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

# DuckDB mirror of dataprep.dedup_key_text (lower -> strip non-alnum ->
# collapse whitespace -> trim); 'g' flag because DuckDB's regexp_replace
# is first-match-only by default, unlike Spark's.
_DEDUP_KEY = (
    "trim(regexp_replace(regexp_replace(lower(coalesce({t}, '')),"
    " '[^a-z0-9 \t\n]', '', 'g'), '[ \t\n]+', ' ', 'g'))"
)


@query(
    "vocab_drift_js",
    """
    WITH ta AS (
      SELECT t AS tok, CAST(count(*) AS BIGINT) AS a
      FROM (SELECT unnest(string_split(text, ' ')) AS t
            FROM documents WHERE doc_id % 2 = 0)
      WHERE t <> '' GROUP BY 1
    ),
    tb AS (
      SELECT t AS tok, CAST(count(*) AS BIGINT) AS b
      FROM (SELECT unnest(string_split(text, ' ')) AS t
            FROM documents WHERE doc_id % 3 <> 0)
      WHERE t <> '' GROUP BY 1
    ),
    j AS (
      SELECT coalesce(ta.a, 0) AS a, coalesce(tb.b, 0) AS b
      FROM ta FULL OUTER JOIN tb ON ta.tok = tb.tok
    ),
    tot AS (
      SELECT CAST(sum(a) AS BIGINT) AS ta_n, CAST(sum(b) AS BIGINT) AS tb_n
      FROM j
    ),
    x AS (
      SELECT a, b, ta_n, tb_n,
             CAST(floor(ln(CAST(a*tb_n + b*ta_n AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS den
      FROM j CROSS JOIN tot
    ),
    s AS (
      SELECT
        CAST(sum(CASE WHEN a > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_a,
        CAST(sum(CASE WHEN b > 0 THEN 1 ELSE 0 END) AS BIGINT) AS types_b,
        CAST(sum(CASE WHEN a > 0 AND b > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS types_common,
        CAST(sum(CASE WHEN b > 0 AND a = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS types_new,
        CAST(sum(CASE WHEN a > 0 AND b = 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS types_lost,
        max(ta_n) AS tokens_a, max(tb_n) AS tokens_b,
        CAST(sum(CASE WHEN a > 0 THEN a * (
          CAST(floor(ln(CAST(2*a*tb_n AS DOUBLE)) * 1000000.0) AS BIGINT)
          - den) ELSE 0 END) AS BIGINT) AS sp,
        CAST(sum(CASE WHEN b > 0 THEN b * (
          CAST(floor(ln(CAST(2*b*ta_n AS DOUBLE)) * 1000000.0) AS BIGINT)
          - den) ELSE 0 END) AS BIGINT) AS sq,
        CAST(sum(abs(a*tb_n - b*ta_n)) AS BIGINT) AS stv
      FROM x
    )
    SELECT types_a, types_b, types_common, types_new, types_lost,
           tokens_a, tokens_b,
           CAST(floor((CAST(sp AS DOUBLE) / tokens_a
                       + CAST(sq AS DOUBLE) / tokens_b) / 2.0) AS BIGINT)
             AS js_micro,
           CAST((stv * 500000) // (tokens_a * tokens_b) AS BIGINT) AS tv_ppm
    FROM s
    """,
)
def vocab_drift_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-version drift gate (`dataprep.vocab_drift`): two
    overlapping deterministic slices of documents stand in for release
    v(n) / v(n+1); the gate pins type churn (new/lost/common), total
    token counts, quantized-micro-nat Jensen-Shannon divergence, and
    exact-ppm total variation. The oracle re-derives every L(k) from
    the same exact integers, so a drift in either engine's tokenize,
    join, or quantization breaks the hash."""
    from logstash_spark.operators.dataprep import vocab_drift  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    va = docs.where(F.col("doc_id") % 2 == 0)
    vb = docs.where(F.col("doc_id") % 3 != 0)
    return vocab_drift(va, vb)


@query(
    "dedup_audit_histogram",
    f"""
    WITH variants AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             upper(text) || '  !!'
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 2000000,
             '  ' || replace(text, ' ', ',  ') || '.'
      FROM documents WHERE doc_id % 10 = 0
    ),
    keyed AS (
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             {_DEDUP_KEY.format(t="text")} AS k
      FROM variants
    ),
    clusters AS (
      SELECT k, CAST(count(*) AS BIGINT) AS sz,
             CAST(sum(n_chars) AS BIGINT) AS chars,
             CAST(arg_min(n_chars, doc_id) AS BIGINT) AS kept
      FROM keyed GROUP BY k
    )
    SELECT sz AS cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(sum(sz) AS BIGINT) AS n_docs,
           CAST(sum(sz) - count(*) AS BIGINT) AS n_dup_docs,
           CAST(sum(chars - kept) AS BIGINT) AS chars_dup
    FROM clusters GROUP BY sz
    """,
)
def dedup_audit_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-audit gate (`dataprep.dedup_audit`): the corpus plus two
    decorated re-renderings (SHOUTING + punctuation noise for doc_id%5,
    a comma-riddled variant for doc_id%10) must collapse through
    `dedup_key_text` into the expected cluster-size histogram with
    exact keep-min-survivor byte accounting. Both engines re-derive the
    key from text, so the gate also proves the two regex dialects
    agree."""
    from logstash_spark.operators.dataprep import dedup_audit  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    v1 = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.upper("text"), F.lit("  !!")).alias("text"),
    )
    v2 = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.concat(
            F.lit("  "), F.regexp_replace("text", " ", ",  "), F.lit(".")
        ).alias("text"),
    )
    allv = docs.unionByName(v1).unionByName(v2).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    return dedup_audit(allv)


@query(
    "pack_next_fit_bins",
    f"""
    WITH RECURSIVE items AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS len,
             CAST({_H32.format(s="doc_id || ':nfd'")} % 8 AS INT) AS shard
      FROM documents
    ),
    numbered AS (
      SELECT *, row_number() OVER (PARTITION BY shard
                                   ORDER BY len DESC, doc_id ASC) AS rn
      FROM items
    ),
    walk AS (
      SELECT shard, rn, doc_id, len, 0 AS bin, len AS load
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.shard, n.rn, n.doc_id, n.len,
             CASE WHEN w.load + n.len <= 1000 THEN w.bin ELSE w.bin + 1 END,
             CASE WHEN w.load + n.len <= 1000 THEN w.load + n.len
                  ELSE n.len END
      FROM walk w JOIN numbered n ON n.shard = w.shard AND n.rn = w.rn + 1
    )
    SELECT shard, CAST(bin AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len) AS BIGINT) AS sum_len,
           CAST(1000 - sum(len) AS BIGINT) AS slack
    FROM walk GROUP BY 1, 2
    """,
)
def pack_next_fit_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-preserving packing gate (`dataprep.pack_next_fit`):
    documents sharded 8 ways, packed longest-first into capacity-1000
    bins without ever splitting a doc; the gate pins per-bin membership
    counts, loads, and slack. The oracle replays the sequential
    next-fit walk as a genuine recursive CTE (one doc per shard per
    step) — an independent implementation of the recurrence the Spark
    side streams through mapInPandas."""
    from logstash_spark.operators.dataprep import pack_next_fit  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_next_fit(
        docs, capacity=1000, id_col="doc_id", len_col="n_chars", n_shards=8
    )
    return packed.groupBy("shard", "bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_len"),
        (F.lit(1000) - F.sum("n_chars")).cast("long").alias("slack"),
    )

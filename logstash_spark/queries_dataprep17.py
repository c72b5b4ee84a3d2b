"""Correctness-gate queries, dataprep batch 17 (round 3): sentence
segmentation + sentence-aware RAG chunking, and the JSON key census.

The chunking oracle REPLAYS the assignment/overlap algebra with DuckDB
list functions (1-based lambda indices vs Spark's 0-based — the replay
is a genuine re-derivation, not a string copy); the census oracle uses
DuckDB's native json_keys, fully independent of Spark's from_json.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import sentence_split_sql
from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# sentence_chunking
# ---------------------------------------------------------------------------

_CHUNK = 60
_TX_SQL = (
    "('Alpha ' || substr(text, 1, 40) || '. Beta ' || substr(text, 41, 40)"
    " || '! Gamma close here. Delta tail ends now.')"
)


@query(
    "sentence_chunking",
    f"""
    WITH s AS (
      SELECT doc_id, {sentence_split_sql(_TX_SQL)} AS sents FROM documents
    ),
    c AS (
      SELECT doc_id, sents,
             list_transform(range(1, len(sents) + 1),
               i -> CAST(coalesce(list_sum(list_transform(
                      sents[1:CAST(i - 1 AS INT)], x -> length(x))), 0)
                    // {_CHUNK} AS BIGINT)) AS cids
      FROM s
    ),
    e AS (
      SELECT doc_id, sents, cids, CAST(ks.k AS BIGINT) AS chunk_id
      FROM c, (SELECT unnest(range(0, 64)) AS k) ks
      WHERE ks.k <= cids[len(cids)]
    ),
    o AS (
      SELECT doc_id, chunk_id,
             list_filter(sents, (x, i) -> cids[CAST(i AS INT)] = chunk_id)
               AS own,
             list_filter(sents, (x, i) -> cids[CAST(i AS INT)] = chunk_id - 1)
               AS prev
      FROM e
    ),
    w AS (
      SELECT doc_id, chunk_id, own,
             CASE WHEN len(prev) >= 1
                  THEN prev[len(prev):len(prev)] ELSE [] END AS tail
      FROM o
    )
    SELECT doc_id, chunk_id,
           md5(array_to_string(list_concat(tail, own), ' ')) AS chunk_md5,
           CAST(len(own) AS BIGINT) AS n_sentences,
           CAST(coalesce(list_sum(list_transform(own, x -> length(x))), 0)
                AS BIGINT) AS n_chars
    FROM w
    """,
)
def sentence_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aware chunking gate (`dataprep.sentence_split` +
    `chunk_sentences`): each document is wrapped into a 4-sentence text,
    split on capital-start boundaries, and packed into ~60-char chunks
    with a 1-sentence overlap. The oracle re-derives the cumulative
    assignment and overlap with DuckDB list functions. Zero shuffle —
    map + map-side posexplode."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tx = F.concat(
        F.lit("Alpha "),
        F.substring("text", 1, 40),
        F.lit(". Beta "),
        F.substring("text", 41, 40),
        F.lit("! Gamma close here. Delta tail ends now."),
    )
    built = docs.select("doc_id", tx.alias("text"))
    out = D.chunk_sentences(
        built, chunk_chars=_CHUNK, overlap_sentences=1
    )
    return out.select(
        "doc_id",
        "chunk_id",
        F.md5("chunk_text").alias("chunk_md5"),
        "n_sentences",
        "n_chars",
    )


# ---------------------------------------------------------------------------
# json_key_census
# ---------------------------------------------------------------------------

_J_SQL = (
    "('{' || '\"id\":' || doc_id"
    " || CASE WHEN doc_id % 2 = 0 THEN ',\"lang\":\"' || lang || '\"'"
    "         ELSE '' END"
    " || CASE WHEN doc_id % 3 = 0 THEN ',\"src\":\"' || source || '\"'"
    "         ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ',\"extra\":1' ELSE '' END"
    " || '}')"
)


@query(
    "json_key_census",
    f"""
    WITH j AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN 'not json'
                  ELSE {_J_SQL} END AS msg
      FROM documents
    ),
    k AS (
      SELECT unnest(json_keys(msg)) AS key FROM j
      WHERE doc_id % 11 != 0
    ),
    c AS (SELECT key, CAST(count(*) AS BIGINT) AS n_docs_with_key
          FROM k GROUP BY 1),
    t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM j)
    SELECT key, n_docs_with_key,
           CAST((n_docs_with_key * 1000000) // total AS BIGINT)
             AS coverage_ppm
    FROM c, t
    """,
)
def json_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read gate (`dataprep.json_key_census`): a synthesized
    JSON feed with parity-dependent optional keys plus a corrupt-row
    channel (every 11th row is not JSON — it must count in the coverage
    denominator but contribute no keys). The oracle uses DuckDB's
    native json_keys, fully independent of Spark's from_json parse."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    j = F.concat(
        F.lit('{"id":'),
        i.cast("string"),
        F.when(
            i % 2 == 0, F.concat(F.lit(',"lang":"'), F.col("lang"), F.lit('"'))
        ).otherwise(F.lit("")),
        F.when(
            i % 3 == 0, F.concat(F.lit(',"src":"'), F.col("source"), F.lit('"'))
        ).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit(',"extra":1')).otherwise(F.lit("")),
        F.lit("}"),
    )
    built = docs.select(
        F.when(i % 11 == 0, F.lit("not json")).otherwise(j).alias("message")
    )
    return D.json_key_census(built, "message")

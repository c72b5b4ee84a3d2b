"""Correctness-gate queries, dataprep batch 21 (round 3): char-span →
token-span alignment and the one-row corpus data card. The span oracle
re-derives token offsets with DuckDB list prefix sums; the data card is
an independent full-table aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

# ---------------------------------------------------------------------------
# span_token_alignment
# ---------------------------------------------------------------------------

@query(
    "span_token_alignment",
    f"""
    WITH t AS (
      SELECT doc_id, substr(text, 1, 80) AS t,
             {_H32.format(s="doc_id || ':sa'")}
               % greatest(length(substr(text, 1, 80)), 1) AS s0
      FROM documents
    ),
    sp AS (
      SELECT doc_id, t, s0 AS s,
             least(s0 + 1 + ({_H32.format(s="doc_id || ':sb'")} % 20),
                   CAST(length(t) AS BIGINT)) AS e
      FROM t
    ),
    w AS (
      SELECT doc_id, s, e, string_split(t, ' ') AS w FROM sp
    ),
    st AS (
      SELECT doc_id, s, e, w,
             list_transform(range(1, len(w) + 1),
               i -> CAST(coalesce(list_sum(list_transform(
                      w[1:CAST(i - 1 AS INT)], x -> length(x) + 1)), 0)
                    AS BIGINT)) AS starts
      FROM w
    ),
    ov AS (
      SELECT doc_id, s, e, len(w) AS n_tokens,
             list_filter(range(1, len(w) + 1),
               i -> starts[CAST(i AS INT)] < e
                AND starts[CAST(i AS INT)]
                    + length(w[CAST(i AS INT)]) > s) AS hits
      FROM st
    )
    SELECT doc_id,
           CAST(s AS BIGINT) AS span_start, CAST(e AS BIGINT) AS span_end,
           CAST(CASE WHEN len(hits) = 0 THEN 0 ELSE hits[1] - 1 END
                AS BIGINT) AS tok_start,
           CAST(CASE WHEN len(hits) = 0 THEN 0 ELSE hits[len(hits)] END
                AS BIGINT) AS tok_end,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM ov
    """,
)
def span_token_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-alignment gate (`dataprep.char_span_to_token_span`):
    hash-derived char spans over each document's prefix mapped to the
    covering whitespace-token span — the PII/NER annotation bridge into
    `chat_loss_mask`. The oracle re-derives token start offsets with
    its own list prefix sums. Zero shuffle."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.substring("text", 1, 80)
    s0 = D.portable_hash32(
        F.concat(F.col("doc_id").cast("string"), F.lit(":sa"))
    ) % F.greatest(F.length(t), F.lit(1)).cast("long")
    e0 = F.least(
        s0
        + 1
        + D.portable_hash32(
            F.concat(F.col("doc_id").cast("string"), F.lit(":sb"))
        )
        % 20,
        F.length(t).cast("long"),
    )
    feats = D.char_span_to_token_span(t, s0, e0)
    return docs.select(
        "doc_id",
        s0.alias("span_start"),
        e0.alias("span_end"),
        feats["tok_start"].alias("tok_start"),
        feats["tok_end"].alias("tok_end"),
        feats["n_tokens"].alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# corpus_data_card — the one-row corpus summary
# ---------------------------------------------------------------------------

@query(
    "corpus_data_card",
    """
    WITH k AS (
      SELECT doc_id, lang, source, n_chars,
             len(string_split_regex(text, '\\s+')) AS n_words,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9 \\t\\n]', '', 'g'), '[ \\t\\n]+', ' ', 'g')))
               AS key
      FROM documents
    ),
    lang_top AS (
      SELECT lang FROM k GROUP BY lang
      ORDER BY count(*) DESC, lang ASC LIMIT 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT key) AS BIGINT) AS n_unique_docs,
           CAST(count(*) - count(DISTINCT key) AS BIGINT) AS n_dups,
           CAST(sum(n_words) AS BIGINT) AS total_words,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           (SELECT lang FROM lang_top) AS top_lang,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM k
    """,
)
def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus data card — the summary a curation run
    publishes next to its output shard: doc/unique/dup counts (dups by
    the canonical `dedup_key_text`), word and char totals, language
    spread with the plurality language, source count. ONE aggregation
    pass (count-distincts expand to partial aggregates under AQE);
    oracle is an independent full-table SQL aggregation."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_words"),
        F.md5(D.dedup_key_text(F.col("text"))).alias("key"),
    )
    top_lang = (
        k.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.col("_c").desc(), F.col("lang").asc())
        .limit(1)
        .select("lang")
    )
    card = k.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("key").cast("long").alias("n_unique_docs"),
        (F.count(F.lit(1)) - F.countDistinct("key"))
        .cast("long")
        .alias("n_dups"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return card.crossJoin(
        F.broadcast(top_lang.select(F.col("lang").alias("top_lang")))
    ).select(
        "n_docs",
        "n_unique_docs",
        "n_dups",
        "total_words",
        "total_chars",
        "n_langs",
        "top_lang",
        "n_sources",
    )

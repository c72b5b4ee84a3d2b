"""Correctness-gate queries, dataprep batch 9 (round 3): PMI phrase
mining (word2phrase collocations) over the documents corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logstash_spark.queries import query

_MINC = 3
_DELTA = 1
_TOPK = 200


@query(
    "pmi_phrases",
    f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
      FROM documents
    ),
    nz AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS p
      FROM w WHERE word != ''
    ),
    big AS (
      SELECT w1, w2 FROM (
        SELECT lag(word) OVER (PARTITION BY doc_id ORDER BY p) AS w1,
               word AS w2
        FROM nz
      ) WHERE w1 IS NOT NULL
    ),
    bcounts AS (
      SELECT w1, w2, count(*) AS cnt_ab FROM big GROUP BY w1, w2
      HAVING count(*) >= {_MINC} AND count(*) > {_DELTA}
    ),
    uni AS (SELECT word, count(*) AS cnt FROM nz GROUP BY word),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS n,
             CAST(floor(log2(CAST(sum(cnt) AS DOUBLE))) AS BIGINT) AS log_n
      FROM uni
    )
    SELECT w1, w2,
           CAST(cnt_ab AS BIGINT) AS cnt_ab,
           CAST(a.cnt AS BIGINT) AS cnt_a,
           CAST(b.cnt AS BIGINT) AS cnt_b,
           CAST(floor(log2(CAST(cnt_ab - {_DELTA} AS DOUBLE))) + log_n
                - floor(log2(CAST(a.cnt AS DOUBLE)))
                - floor(log2(CAST(b.cnt AS DOUBLE))) AS INT) AS pmi_q,
           round(CAST(cnt_ab - {_DELTA} AS DOUBLE) * CAST(n AS DOUBLE)
                 / (CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE)), 4)
             AS score
    FROM bcounts
    JOIN uni a ON bcounts.w1 = a.word
    JOIN uni b ON bcounts.w2 = b.word, tot
    ORDER BY pmi_q DESC, cnt_ab DESC, w1, w2
    LIMIT {_TOPK}
    """,
)
def pmi_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2phrase PMI collocation mining (`dataprep.pmi_phrases`;
    Mikolov et al. 2013 §4): score(a,b) = (cnt(ab)−δ)·N / (cnt(a)·cnt(b))
    over corpus bigram/unigram counts, integer bit-length-quantized log2
    PMI (`pmi_q`) as the cross-engine-exact ranking key, float score for
    human reading. Deterministic total order (pmi_q DESC, cnt_ab DESC,
    w1, w2). Topology: ONE pairing explode + groupBy(w1,w2) with
    map-side partials, df-cut before the vocabulary joins, top-K
    TakeOrdered — never a full sort."""
    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return D.pmi_phrases(
        docs, min_count=_MINC, delta=_DELTA, top_k=_TOPK
    )


# ---------------------------------------------------------------------------
# FIM (fill-in-the-middle) token transform
# ---------------------------------------------------------------------------

_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"
_TOK_N = "(doc_id % 37) + 3"
_TOK_SQL = (
    f"list_transform(range(0, {_TOK_N}), "
    "i -> CAST((doc_id * 7 + i * 13) % 50000 AS INTEGER))"
)
_FIM_RATE = 50


@query(
    "fim_transform",
    f"""
    WITH docs AS (
      SELECT doc_id, CAST({_TOK_N} AS INT) AS n, {_TOK_SQL} AS t
      FROM documents
    ),
    h AS (
      SELECT doc_id, n, t,
             {_H32.format(x="CAST(doc_id AS VARCHAR) || ':fim:a'")} AS h1,
             {_H32.format(x="CAST(doc_id AS VARCHAR) || ':fim:b'")} AS h2,
             {_H32.format(x="CAST(doc_id AS VARCHAR) || ':fim:sel'")} AS hsel
      FROM docs
    ),
    c AS (
      SELECT doc_id, n, t,
             (hsel % 100 < {_FIM_RATE} AND n >= 4) AS selected,
             least(CAST(h1 % greatest(n - 1, 1) + 1 AS INT),
                   CAST(h2 % greatest(n - 1, 1) + 1 AS INT)) AS lo,
             greatest(CAST(h1 % greatest(n - 1, 1) + 1 AS INT),
                      CAST(h2 % greatest(n - 1, 1) + 1 AS INT)) AS hi
      FROM h
    ),
    f AS (
      SELECT doc_id, selected,
             CASE WHEN selected THEN
               [CAST(50281 AS INT)] || t[1:lo]
               || [CAST(50283 AS INT)] || t[hi+1:n]
               || [CAST(50282 AS INT)] || t[lo+1:hi]
             ELSE t END AS toks
      FROM c
    )
    SELECT doc_id,
           md5(array_to_string(toks, ',')) AS tokens_md5,
           CAST(len(toks) AS INT) AS n_tok,
           selected AS fim_applied
    FROM f
    """,
)
def fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle transform gate (`dataprep.fim_transform`;
    Bavarian et al. 2022): hash-selected 50% of docs reorder to
    ``[PRE] prefix [SUF] suffix [MID] middle`` with cut points derived
    from md5 — zero RNG state, zero shuffle, pure slice/concat algebra.
    The driver canonicalizer can't sort raw arrays, so the gate emits
    md5-canonicalized token payloads (same convention as
    token_chunking); the raw arrays are covered by unit tests."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 37 + 3).cast("int")
    toks = FN.transform(
        FN.sequence(FN.lit(0), n - 1),
        lambda i: ((FN.col("doc_id") * 7 + i * 13) % 50000).cast("int"),
    )
    src = docs.select("doc_id", toks.alias("tokens"))
    out = D.fim_transform(src, rate_pct=_FIM_RATE)
    return out.select(
        "doc_id",
        FN.md5(
            FN.concat_ws(",", FN.col("tokens").cast("array<string>"))
        ).alias("tokens_md5"),
        "n_tok",
        "fim_applied",
    )

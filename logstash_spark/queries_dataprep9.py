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

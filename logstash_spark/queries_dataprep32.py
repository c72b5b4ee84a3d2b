"""Correctness-gate queries, dataprep batch 32 (round 3): the in-cluster
Naive-Bayes quality-classifier train→apply loop. The oracle retrains the
ENTIRE model in DuckDB SQL — token counts, class stats, vocabulary,
quantized log-space scoring and the argmax — so the gate certifies the
trained model end to end, not just the apply pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

# floor(1e6 · ln(k)) — the quantized log term; k is always an exact integer
_LQ = "CAST(floor(ln({k}) * 1000000) AS BIGINT)"

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


@query(
    "nb_classifier_train",
    f"""
    WITH lab AS (
      SELECT doc_id, text,
             CASE WHEN {_H32.format(s="source || ':nb'")} % 2 = 0
                  THEN 'pos' ELSE 'neg' END AS label,
             doc_id % 5 = 4 AS is_test
      FROM documents
    ),
    tr AS (SELECT * FROM lab WHERE NOT is_test),
    trtok AS (
      SELECT label, unnest({_TOKS}) AS token FROM tr
    ),
    tc AS (
      SELECT label, token, CAST(count(*) AS BIGINT) AS cnt
      FROM trtok GROUP BY 1, 2
    ),
    cs AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs FROM tr GROUP BY 1),
    ct AS (SELECT label, CAST(count(*) AS BIGINT) AS n_tokens FROM trtok GROUP BY 1),
    v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS vs FROM trtok),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM tr),
    te AS (
      SELECT doc_id, {_TOKS} AS toks FROM lab WHERE is_test
    ),
    ex AS (SELECT doc_id, unnest(toks) AS token FROM te),
    ms AS (
      SELECT e.doc_id,
        CAST(coalesce(sum(CASE WHEN t.label = 'pos'
          THEN {_LQ.format(k="t.cnt + 1")} END), 0) AS BIGINT) AS ms_pos,
        CAST(coalesce(sum(CASE WHEN t.label = 'neg'
          THEN {_LQ.format(k="t.cnt + 1")} END), 0) AS BIGINT) AS ms_neg
      FROM ex e LEFT JOIN tc t USING (token) GROUP BY 1
    ),
    scored AS (
      SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tok,
        {_LQ.format(k="(SELECT n_docs FROM cs WHERE label = 'pos')")}
          - {_LQ.format(k="(SELECT nd FROM nn)")}
          + coalesce(m.ms_pos, 0)
          - CAST(len(t.toks) AS BIGINT)
            * {_LQ.format(k="(SELECT n_tokens FROM ct WHERE label = 'pos') + (SELECT vs FROM v)")}
          AS nb_score_pos_q,
        {_LQ.format(k="(SELECT n_docs FROM cs WHERE label = 'neg')")}
          - {_LQ.format(k="(SELECT nd FROM nn)")}
          + coalesce(m.ms_neg, 0)
          - CAST(len(t.toks) AS BIGINT)
            * {_LQ.format(k="(SELECT n_tokens FROM ct WHERE label = 'neg') + (SELECT vs FROM v)")}
          AS nb_score_neg_q
      FROM te t LEFT JOIN ms m USING (doc_id)
    )
    SELECT doc_id, n_tok, nb_score_pos_q, nb_score_neg_q,
           CASE WHEN nb_score_pos_q > nb_score_neg_q THEN 'pos'
                ELSE 'neg' END AS nb_label
    FROM scored
    """,
)
def nb_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→apply gate for `dataprep.nb_train`/`nb_classify`: an 80%
    doc_id-split training slice labeled by a source-hash rule, the
    multinomial model counted in-cluster, the held-out 20% scored in
    quantized log space (every term floor(10⁶·ln k) of an exact
    integer) with the lexicographic tie rule. The oracle retrains and
    rescores everything independently in DuckDB."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lab = docs.select(
        "doc_id",
        "text",
        F.when(
            D.portable_hash32(F.concat(F.col("source"), F.lit(":nb"))) % 2 == 0,
            F.lit("pos"),
        ).otherwise(F.lit("neg")).alias("label"),
        (F.col("doc_id") % 5 == 4).alias("is_test"),
    )
    token_counts, class_stats, vocab = D.nb_train(lab.filter(~F.col("is_test")))
    test = lab.filter(F.col("is_test")).select("doc_id", "text")
    return D.nb_classify(
        test, token_counts, class_stats, vocab, ["neg", "pos"]
    ).select("doc_id", "n_tok", "nb_score_pos_q", "nb_score_neg_q", "nb_label")

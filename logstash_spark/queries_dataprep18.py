"""Correctness-gate queries, dataprep batch 18 (round 3): readability
metrics (integer Flesch-Kincaid) and keyword-taxonomy tagging. Both
oracles are independent DuckDB derivations — regexp_extract_all counts
for readability; list_intersect + a greatest/CASE argmax for taxonomy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import sentence_split_sql
from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# readability_metrics
# ---------------------------------------------------------------------------

_TXR = (
    "('Intro one. ' || substr(text, 1, 60) || '. Closing words here count 42.')"
)


@query(
    "readability_metrics",
    f"""
    WITH t AS (SELECT doc_id, {_TXR} AS t FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(string_split_regex(t, '\\s+')) AS BIGINT) AS n_words,
             CAST(greatest(len({sentence_split_sql("t")}), 1) AS BIGINT)
               AS n_sentences,
             CAST(len(regexp_extract_all(lower(t), '[aeiouy]+')) AS BIGINT)
               AS n_syllables,
             CAST(len(regexp_extract_all(t, '[0-9]')) AS BIGINT) AS digits,
             CAST(greatest(length(t), 1) AS BIGINT) AS chars
      FROM t
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST((39 * greatest(n_words, 1)) // n_sentences
                + (1180 * n_syllables) // greatest(n_words, 1)
                - 1559 AS BIGINT) AS fk_grade_cb,
           CAST((digits * 10000) // chars AS BIGINT) AS digit_ratio_bp
    FROM m
    """,
)
def readability_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Readability gate (`dataprep.readability_features`): each document
    wrapped into a multi-sentence text with digits, then word/sentence/
    syllable counts and the Flesch-Kincaid grade in exact centi-grades
    plus the digit-ratio data-dump detector. Zero shuffle; oracle
    re-counts with DuckDB regexp_extract_all."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tx = F.concat(
        F.lit("Intro one. "),
        F.substring("text", 1, 60),
        F.lit(". Closing words here count 42."),
    )
    feats = D.readability_features(tx)
    return docs.select("doc_id", *[v.alias(k) for k, v in feats.items()])


# ---------------------------------------------------------------------------
# taxonomy_tagging
# ---------------------------------------------------------------------------

_TAXONOMY = {
    "commerce": ["order", "price", "supplier", "account"],
    "geo": ["region", "nation", "east", "asia"],
    "tech": ["data", "system", "packet", "engine"],
}


def _tax_cnt_sql(cat: str) -> str:
    words = sorted({w.lower() for w in _TAXONOMY[cat]})
    lits = ", ".join(f"'{w}'" for w in words)
    return (
        "CAST(len(list_intersect(list_distinct(list_transform("
        "string_split_regex(text, '\\s+'), x -> lower(x))), "
        f"[{lits}])) AS BIGINT)"
    )


@query(
    "taxonomy_tagging",
    f"""
    WITH c AS (
      SELECT doc_id,
             {_tax_cnt_sql("commerce")} AS tax_commerce,
             {_tax_cnt_sql("geo")} AS tax_geo,
             {_tax_cnt_sql("tech")} AS tax_tech
      FROM documents
    ),
    g AS (
      SELECT *, greatest(tax_commerce, tax_geo, tax_tech) AS mx,
             tax_commerce + tax_geo + tax_tech AS tot
      FROM c
    )
    SELECT doc_id, tax_commerce, tax_geo, tax_tech,
           CASE WHEN tot = 0 THEN ''
                WHEN tax_commerce = mx THEN 'commerce'
                WHEN tax_geo = mx THEN 'geo'
                ELSE 'tech' END AS tax_dominant,
           CAST(tot AS BIGINT) AS tax_total
    FROM g
    """,
)
def taxonomy_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taxonomy gate (`dataprep.taxonomy_tags`): a 3-category keyword
    taxonomy over document text — per-category distinct-hit counts,
    dominant category (ties → name ASC), total. The oracle derives the
    argmax with a greatest/CASE chain in category-name order —
    equivalent to the operator's min(struct(−count, name)) pick."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.taxonomy_tags(docs, _TAXONOMY)
    return out.select(
        "doc_id", "tax_commerce", "tax_geo", "tax_tech",
        "tax_dominant", "tax_total",
    )

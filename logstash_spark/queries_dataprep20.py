"""Correctness-gate queries, dataprep batch 20 (round 3): URL
language-variant pairing (the ParaCrawl bitext seed) and deterministic
recency-weighted sampling. The pairing oracle derives lang/canon in
CLOSED FORM from doc_id (never running the extraction regex), so it
checks the extractor's semantics as well as the pair expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"

# ---------------------------------------------------------------------------
# url_lang_pairing
# ---------------------------------------------------------------------------

_URL_SQL = (
    "('https://s' || (doc_id % 60) || '.example'"
    " || CASE doc_id % 4 WHEN 0 THEN '/en' WHEN 1 THEN '/fr'"
    "                    WHEN 2 THEN '/de' ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN '' "
    "         ELSE '/p' || (doc_id % 7) END)"
)


@query(
    "url_lang_pairing",
    f"""
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'fr'
                             WHEN 2 THEN 'de' ELSE '' END AS lang,
             'https://s' || (doc_id % 60) || '.example'
               || CASE WHEN doc_id % 9 = 0 THEN ''
                       ELSE '/p' || (doc_id % 7) END AS canon
      FROM documents
    ),
    c AS (SELECT * FROM d WHERE lang != '')
    SELECT a.canon, a.lang AS lang_a, a.doc_id AS doc_a,
           b.lang AS lang_b, b.doc_id AS doc_b
    FROM c a JOIN c b
      ON a.canon = b.canon AND a.lang < b.lang
    """,
)
def url_lang_pairing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext-seed gate (`dataprep.url_lang_variants` +
    `url_lang_pairs`): synthesized multilingual-site URLs — /en/ /fr/
    /de/ variants of shared pages, a no-lang control arm, and a
    no-trailing-path arm (exercising the optional regex group in both
    engines). The oracle derives lang and canonical URL in closed form
    from doc_id, never touching the extraction regex — an extractor
    defect cannot cancel out."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    url = F.concat(
        F.lit("https://s"),
        (i % 60).cast("string"),
        F.lit(".example"),
        F.when(i % 4 == 0, F.lit("/en"))
        .when(i % 4 == 1, F.lit("/fr"))
        .when(i % 4 == 2, F.lit("/de"))
        .otherwise(F.lit("")),
        F.when(i % 9 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/p"), (i % 7).cast("string"))
        ),
    )
    built = docs.select("doc_id", url.alias("url"))
    return D.url_lang_pairs(built)


# ---------------------------------------------------------------------------
# recency_sampling
# ---------------------------------------------------------------------------

_REF = "2024-02-15 00:00:00"


@query(
    "recency_sampling",
    f"""
    WITH a AS (
      SELECT event_id,
             CAST((CAST(epoch(TIMESTAMP '{_REF}') AS BIGINT)
                   - CAST(floor(epoch(ts)) AS BIGINT)) // 86400 AS BIGINT)
               AS age_days
      FROM events
    ),
    h AS (
      SELECT event_id,
             least(greatest(age_days, 0) // 7, 20) AS halvings
      FROM a
    )
    SELECT event_id,
           CAST(halvings AS BIGINT) AS _halvings,
           ({_H32.format(s="event_id || ':recency'")} % 1048576)
             < (1 << (20 - halvings)) AS _keep
    FROM h
    """,
)
def recency_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-sampling gate (`dataprep.recency_weighted_sample`): the
    events table against a fixed reference instant — keep-probability
    halves every 7 days of age, ages spanning 16-45 days so several
    halving buckets occur. Pure integer shifts against the md5 uniform;
    oracle replays the arithmetic independently. Zero shuffle."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = D.recency_weighted_sample(
        events, reference_ts=_REF, half_life_days=7
    )
    return out.select("event_id", "_halvings", "_keep")

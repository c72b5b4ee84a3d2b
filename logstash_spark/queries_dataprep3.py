"""Correctness-gate queries, dataprep batch 3: corpus curation —
deterministic stratified sampling, linear quality-classifier scoring,
and deterministic shard assignment for training export. Same parity
discipline as the other dataprep batches: md5-derived hashes, dyadic-
rational weights, fixed fold order, no raw arrays in the SELECT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logstash_spark.operators import dataprep as D
from logstash_spark.queries import query
from logstash_spark.queries_dataprep import _docs

_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"

# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

_RATES = {"en": 0.5, "de": 0.25}
_DEFAULT_RATE = 0.1
_SCALE = 1_000_000


@query(
    "stratified_sample_det",
    f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_H32.format(x="CAST(doc_id AS VARCHAR) || ':strat'")} % {_SCALE}
          < CASE lang WHEN 'de' THEN 250000 WHEN 'en' THEN 500000
                      ELSE 100000 END
    """,
)
def stratified_sample_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum downsampling (`dataprep.stratified_sample`):
    keep en at 50%, de at 25%, everything else at 10%, decided by
    `portable_hash32(doc_id ':strat') % 10^6` against literal thresholds.
    ONE pushdown-able filter — zero shuffle; the identical md5 hash on
    both engines makes the sample membership bit-for-bit reproducible."""
    docs = _docs(spark, sf_dir)
    out = D.stratified_sample(
        docs, _RATES, default_rate=_DEFAULT_RATE, seed="strat", scale=_SCALE
    )
    return out.select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Linear quality-classifier scoring
# ---------------------------------------------------------------------------

_STOPS_SQL = "['the', 'a', 'and', 'of', 'to', 'in', 'is', 'it']"


@query(
    "quality_classifier_keep",
    f"""
    WITH base AS (
      SELECT doc_id, text, string_split(text, ' ') AS w, length(text) AS n_chars
      FROM documents
    ),
    feat AS (
      SELECT doc_id,
             least(1.0, CAST(len(w) AS DOUBLE) / 64) AS len_norm,
             round(CAST(len(list_filter(w, x -> list_contains({_STOPS_SQL}, x))) AS DOUBLE)
                   / len(w), 4) AS stop_ratio,
             round(CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
                   / n_chars, 4) AS punct_ratio
      FROM base
    ),
    q AS (
      -- integer quantization mirrors the Spark op exactly: features to
      -- 1e-4 units (they ARE 4dp decimals / dyadics — no float fuzz),
      -- weights ×10, bias/threshold in 1e-5 units
      SELECT doc_id,
             CAST(round(len_norm * 10000) AS BIGINT) AS lq,
             CAST(round(punct_ratio * 10000) AS BIGINT) AS pq,
             CAST(round(round(len_norm * (1 - punct_ratio)
                              * (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6
                                      THEN 1.0 ELSE 0.5 END), 4)
                        * 10000) AS BIGINT) AS qq,
             CAST(round(stop_ratio * 10000) AS BIGINT) AS sq
      FROM feat
    ),
    scored AS (
      SELECT doc_id,
             -125000 + lq * 20 + pq * -40 + qq * 10 + sq * 15 AS clf_logit_q
      FROM q
    )
    SELECT doc_id, clf_logit_q,
           CAST(clf_logit_q AS DOUBLE) / 100000 AS clf_logit,
           clf_logit_q > 0 AS clf_keep
    FROM scored
    """,
)
def quality_classifier_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier (`dataprep.quality_classifier`, the
    fasttext/DCLM keep-vs-drop analog as broadcast literal weights):
    logit = -1.25 + 2·len_norm − 4·punct_ratio + 1·quality +
    1.5·stop_ratio over `quality_features`, keep = logit > 0. Scoring is
    exact BIGINT arithmetic (features quantized to 1e-4 units, weights
    ×10 → logit in 1e-5 units): a float sum of 4dp-rounded features
    lands ON decimal rounding ties, so integer quantization is the only
    bit-reproducible form. NOTE the composite `quality` feature equals
    round(len_norm·(1−punct_ratio)·stop_gate, 4) because
    least(1, n/64) is the same dyadic value."""
    docs = _docs(spark, sf_dir)
    out = D.quality_classifier(docs)
    return out.select("doc_id", "clf_logit_q", "clf_logit", "clf_keep")


# ---------------------------------------------------------------------------
# Deterministic shard assignment (training export)
# ---------------------------------------------------------------------------

_N_SHARDS = 8


@query(
    "shard_assign_det",
    f"""
    WITH h AS (
      SELECT doc_id,
             CAST({_H32.format(x="CAST(doc_id AS VARCHAR) || ':shard'")}
                  % {_N_SHARDS} AS INTEGER) AS shard,
             {_H32.format(x="CAST(doc_id AS VARCHAR) || ':shard:ord'")} AS shard_ord
      FROM documents
    )
    SELECT doc_id, shard, shard_ord,
           CAST(row_number() OVER (PARTITION BY shard
                                   ORDER BY shard_ord, doc_id) AS INTEGER)
             AS shard_pos
    FROM h
    """,
)
def shard_assign_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment (`dataprep.shard_assign`):
    shard = hash(doc_id ':shard') % 8, within-shard order by an
    independent second hash — a reproducible global shuffle for epoch-
    stable training export. The gate uses the row_number form (ONE
    shuffle on shard); the production path for n_shards << cores is
    repartition + sortWithinPartitions (same order, no window)."""
    docs = _docs(spark, sf_dir)
    out = D.shard_assign(docs, _N_SHARDS, seed="shard")
    return out.select("doc_id", "shard", "shard_ord", "shard_pos")

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


# ---------------------------------------------------------------------------
# Bigram LM quality (stupid-backoff)
# ---------------------------------------------------------------------------

_BG_VOCAB = 64
_UNI_VOCAB = 64
_BACKOFF = -4
_OOV = -30


@query(
    "bigram_lm_quality",
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
      SELECT doc_id, w1, w2 FROM (
        SELECT doc_id, lag(word) OVER (PARTITION BY doc_id ORDER BY p) AS w1,
               word AS w2
        FROM nz
      ) WHERE w1 IS NOT NULL
    ),
    bcounts AS (SELECT w1, w2, count(*) AS cnt FROM big GROUP BY w1, w2),
    pref AS (SELECT w1, sum(cnt) AS pcnt FROM bcounts GROUP BY w1),
    bvocab AS (
      SELECT w1, w2,
             CAST(floor(log2(cnt)) - floor(log2(pcnt)) AS INT) AS blp
      FROM bcounts JOIN pref USING (w1)
      ORDER BY cnt DESC, w1, w2 LIMIT {_BG_VOCAB}
    ),
    ucounts AS (SELECT word, count(*) AS cnt FROM nz GROUP BY word),
    utot AS (SELECT sum(cnt) AS total FROM ucounts),
    uvocab AS (
      SELECT word AS w2,
             CAST(floor(log2(cnt)) - floor(log2(total)) AS INT) AS ulp
      FROM ucounts, utot
      ORDER BY cnt DESC, word LIMIT {_UNI_VOCAB}
    ),
    s AS (
      SELECT doc_id, count(*) AS n_bigrams,
             sum(coalesce(bv.blp, uv.ulp + {_BACKOFF}, {_OOV})) AS logp2_sum
      FROM big
      LEFT JOIN bvocab bv USING (w1, w2)
      LEFT JOIN uvocab uv USING (w2)
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(logp2_sum AS BIGINT) AS logp2_sum,
           round(CAST(logp2_sum AS DOUBLE) / n_bigrams, 4) AS avg_logp2
    FROM s
    """,
)
def bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram LM quality with stupid-backoff
    (`dataprep.bigram_vocab_logp` + `bigram_logprob_score`; Brants et
    al. 2007): top-64 bigram table with integer log2-quantized
    P(w2|w1), backoff to the top-64 unigram table at 2^-4, OOV floor
    -30. All arithmetic before the final division is exact integers —
    bit-for-bit reproducible across engines. Catches shuffled/keyword-
    stuffed text that unigram frequency alone scores as fluent."""
    docs = _docs(spark, sf_dir)
    bv = D.bigram_vocab_logp(docs, vocab_size=_BG_VOCAB)
    uv = D.unigram_vocab_logp(docs, vocab_size=_UNI_VOCAB)
    out = D.bigram_logprob_score(
        docs, bv, uv, backoff_logp2=_BACKOFF, oov_logp2=_OOV
    )
    return out.select("doc_id", "n_bigrams", "logp2_sum", "avg_logp2")

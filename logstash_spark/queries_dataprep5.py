"""Correctness-gate queries, dataprep batch 5 (round 3, late): DSIR
importance resampling (Xie et al., NeurIPS 2023 — hashed n-gram
importance weights for training-data selection).

Parity discipline: the bucket hash is the md5-derived portable 32-bit
hash, log-probabilities are floor(log2(n)) integer-quantized (exact
cross-engine, see operators/dataprep.py unigram_vocab_logp), and the
Bernoulli resample is pure integer shift arithmetic over an md5
uniform — no floating point anywhere in the gate, so both engines
agree bit-for-bit. The Gumbel top-k variant (double keys) is pinned by
unit tests instead (tests/test_dsir.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query
from logstash_spark.queries_dataprep import _STOPS_SQL

_B = 256  # hashed-feature buckets
_T = -21  # resample threshold: ~median logw2 on the documents table
_SEED = 7


@query(
    "dsir_importance_resample",
    f"""
    WITH wd AS (
      SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents
    ),
    gr AS (
      SELECT doc_id, source,
             list_concat(w, CASE WHEN len(w) >= 2
               THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
               ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM wd
    ),
    gb AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {_B} AS INT) AS bucket
      FROM (SELECT doc_id, source, unnest(grams) AS g FROM gr)
    ),
    tcnt AS (SELECT bucket, count(*) AS t_cnt FROM gb WHERE source = 'src0' GROUP BY bucket),
    rcnt AS (SELECT bucket, count(*) AS r_cnt FROM gb GROUP BY bucket),
    dense AS (SELECT CAST(r AS INT) AS bucket FROM range(0, {_B}) t(r)),
    model AS (
      SELECT bucket, coalesce(t_cnt, 0) AS t_cnt, coalesce(r_cnt, 0) AS r_cnt
      FROM dense LEFT JOIN tcnt USING (bucket) LEFT JOIN rcnt USING (bucket)
    ),
    tot AS (SELECT sum(t_cnt) AS tt, sum(r_cnt) AS rt FROM model),
    ratio AS (
      SELECT bucket,
             CAST((floor(log2(t_cnt + 1)) - floor(log2(tt + {_B})))
                - (floor(log2(r_cnt + 1)) - floor(log2(rt + {_B}))) AS INT) AS logr2
      FROM model, tot
    ),
    per AS (
      SELECT gb.doc_id, count(*) AS n_grams, sum(ratio.logr2) AS logw2
      FROM gb JOIN ratio USING (bucket) GROUP BY gb.doc_id
    ),
    scored AS (
      SELECT d.doc_id,
             CAST(coalesce(per.n_grams, 0) AS INT) AS n_grams,
             CAST(coalesce(per.logw2, 0) AS BIGINT) AS logw2
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    )
    SELECT doc_id, n_grams, logw2,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_SEED}'), 1, 8) AS BIGINT) AS u32,
           (({_T} - logw2) <= 0
            OR (({_T} - logw2) < 32
                AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_SEED}'), 1, 8) AS BIGINT)
                    < (CAST(1 AS BIGINT)
                       << CAST(least(greatest(32 - ({_T} - logw2), 0), 32) AS INT)))) AS keep
    FROM scored
    """,
)
def dsir_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR over the documents table: target = source 'src0', raw = the
    whole corpus. Fit hashed unigram+bigram bag-of-words log-ratios
    (dense 256-bucket model), score every doc map-only via the literal
    ratio table (zero shuffle), Bernoulli-resample at the median weight.
    Threshold -21 ≈ the corpus median, so the gate exercises all three
    branches: deterministic keep (logw2 ≥ T), probabilistic keep
    (0 < deficit < 32), deterministic drop (deficit ≥ 32)."""
    from logstash_spark.operators import dsir as DS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("source") == "src0")
    model = DS.dsir_fit(target, docs, text_col="text", buckets=_B)
    scored = DS.dsir_score(docs, model, id_col="doc_id", text_col="text", buckets=_B)
    out = DS.dsir_resample(
        scored, id_col="doc_id", logw2_col="logw2", threshold=_T, seed=_SEED
    )
    return out.select(
        "doc_id",
        F.col("n_grams").cast("int").alias("n_grams"),
        F.col("logw2").cast("long").alias("logw2"),
        "u32",
        "keep",
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation (the dataprep-side flagship)
# ---------------------------------------------------------------------------

_CUR_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.5}
_CUR_DEFAULT = 0.25
_CUR_SEED = "cure"


@query(
    "corpus_curation_e2e",
    f"""
    WITH base AS (
      SELECT doc_id, source, text, string_split(text, ' ') AS w,
             length(text) AS n_chars
      FROM documents
    ),
    feat AS (
      SELECT doc_id, source, text, len(w) AS nw,
             round(CAST(len(list_filter(w, x -> list_contains({_STOPS_SQL}, x))) AS DOUBLE)
                   / len(w), 4) AS stop_ratio,
             round(CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
                   / n_chars, 4) AS punct_ratio,
             len(list_filter(list_distinct(w), x -> list_contains(['the','a','and','of'], x))) AS s_en,
             len(list_filter(list_distinct(w), x -> list_contains(['table','row','column','query'], x))) AS s_db,
             len(list_filter(list_distinct(w), x -> list_contains(['batch','stream','merge','scan'], x))) AS s_ops
      FROM base
    ),
    scored AS (
      SELECT doc_id, source, text, nw,
             round(least(1.0, CAST(nw AS DOUBLE) / 64) * (1 - punct_ratio)
                   * (CASE WHEN stop_ratio BETWEEN 0.01 AND 0.6 THEN 1.0 ELSE 0.5 END),
                   4) AS quality,
             CASE WHEN greatest(s_en, s_db, s_ops) = 0
                       OR (CAST(s_en = greatest(s_en, s_db, s_ops) AS INTEGER)
                           + CAST(s_db = greatest(s_en, s_db, s_ops) AS INTEGER)
                           + CAST(s_ops = greatest(s_en, s_db, s_ops) AS INTEGER)) != 1
                  THEN 'und'
                  WHEN s_en = greatest(s_en, s_db, s_ops) THEN 'en'
                  WHEN s_db = greatest(s_en, s_db, s_ops) THEN 'db'
                  ELSE 'ops' END AS lang_pred
      FROM feat
    ),
    filt AS (
      SELECT * FROM scored
      WHERE nw >= 5 AND quality >= 0.05 AND lang_pred != 'und'
    ),
    dedup AS (
      SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM filt
    ),
    surv AS (SELECT * FROM dedup WHERE rn = 1),
    samp AS (
      SELECT * FROM surv
      WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{_CUR_SEED}'), 1, 8) AS BIGINT)
            % 1000000
            < CASE source WHEN 'src0' THEN 1000000
                          WHEN 'src1' THEN 500000
                          WHEN 'src2' THEN 500000
                          ELSE 250000 END
    )
    SELECT doc_id, source, lang_pred, CAST(nw AS INTEGER) AS n_words, quality
    FROM samp
    """,
)
def corpus_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation over the documents table —
    the dataprep-side flagship, composing the operators a 100 TB crawl
    pipeline chains: language-ID (marker voting) → quality scoring
    (length/punct/stopword composite) → rule filter → exact dedup
    (min-id survivor per md5(text), ONE window shuffle) → deterministic
    per-source stratified downsampling (plan-time CASE, zero shuffle,
    reproducible under the md5 hash). Everything before the dedup
    window is map-only, so the chain costs exactly one exchange."""
    from pyspark.sql import Window

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = D.quality_features(F.col("text"))
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        D.lang_id(F.col("text")).alias("lang_pred"),
        feats["n_words"].alias("n_words"),
        feats["quality"].alias("quality"),
    )
    filt = scored.where(
        (F.col("n_words") >= 5)
        & (F.col("quality") >= 0.05)
        & (F.col("lang_pred") != "und")
    )
    surv = (
        filt.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(F.md5("text")).orderBy("doc_id")
            ),
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    samp = D.stratified_sample(
        surv,
        _CUR_RATES,
        key_col="doc_id",
        stratum_col="source",
        default_rate=_CUR_DEFAULT,
        seed=_CUR_SEED,
    )
    return samp.select(
        "doc_id",
        "source",
        "lang_pred",
        F.col("n_words").cast("int").alias("n_words"),
        "quality",
    )


# ---------------------------------------------------------------------------
# C4-style keyword blocklist
# ---------------------------------------------------------------------------

_BLOCK_WORDS = ["merge", "drop", "error"]


@query(
    "keyword_blocklist_flags",
    """
    WITH base AS (
      SELECT doc_id,
             list_distinct(list_transform(
               regexp_split_to_array(coalesce(text, ''), '\\s+'), x -> lower(x))) AS dw
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(dw, x -> list_contains(['drop','error','merge'], x)))
                AS INTEGER) AS n_blocked,
           len(list_filter(dw, x -> list_contains(['drop','error','merge'], x))) > 0
             AS blocked
    FROM base
    """,
)
def keyword_blocklist_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 bad-words rule over the documents table: count distinct
    blocklisted words (case-folded whole-word matches) and flag the
    document. One literal array_intersect — zero shuffle."""
    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.keyword_blocklist(docs, _BLOCK_WORDS)
    return out.select(
        "doc_id", F.col("n_blocked").cast("int").alias("n_blocked"), "blocked"
    )


# ---------------------------------------------------------------------------
# Cross-document boilerplate line removal
# ---------------------------------------------------------------------------

_BL_THRESHOLD = 30


@query(
    "boilerplate_line_removal",
    f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN text || '|SUBSCRIBE NOW'
                  WHEN doc_id % 3 = 1 THEN 'COOKIE NOTICE|' || text
                  ELSE text END AS t
      FROM documents
    ),
    lx AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(coalesce(t, ''), '|'),
                                        x -> trim(x)), x -> x != '') AS ls
      FROM corpus
    ),
    freq AS (
      SELECT line, count(*) AS dfc
      FROM (SELECT doc_id, unnest(list_distinct(ls)) AS line FROM lx)
      GROUP BY line
    ),
    b AS (SELECT coalesce(list(line), []) AS bl FROM freq WHERE dfc >= {_BL_THRESHOLD}),
    clean AS (
      SELECT doc_id, ls, list_filter(ls, x -> NOT list_contains(bl, x)) AS kept
      FROM lx, b
    )
    SELECT doc_id,
           array_to_string(kept, '|') AS text_clean,
           CAST(len(ls) - len(kept) AS INTEGER) AS n_removed
    FROM clean
    """,
)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style template-line removal: inject two
    boilerplate lines (SUBSCRIBE NOW / COOKIE NOTICE) into 2/3 of the
    documents, compute per-line document frequency (dup lines within a
    doc count once), and strip lines with df ≥ {threshold}. The
    boilerplate set broadcasts (template lines are few by definition);
    the corpus text never shuffles — membership is an array-local
    filter, preserving original line order."""
    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = (
        F.when(F.col("doc_id") % 3 == 0, F.concat("text", F.lit("|SUBSCRIBE NOW")))
        .when(F.col("doc_id") % 3 == 1, F.concat(F.lit("COOKIE NOTICE|"), "text"))
        .otherwise(F.col("text"))
    )
    corpus = docs.select("doc_id", t.alias("text"))
    freq = D.line_doc_freq(corpus, line_sep="|")
    out = D.remove_boilerplate_lines(
        corpus, freq, threshold=_BL_THRESHOLD, line_sep="|"
    )
    return out.select(
        "doc_id",
        "text_clean",
        F.col("n_removed").cast("int").alias("n_removed"),
    )

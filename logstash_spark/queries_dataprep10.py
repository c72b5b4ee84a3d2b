"""Correctness-gate queries, dataprep batch 10 (round 3): T5/UL2 span
corruption, CCNet perplexity buckets, tokenizer fertility, and
temperature-weighted source mixing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logstash_spark.queries import query

_H32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


# ---------------------------------------------------------------------------
# T5/UL2 span corruption
# ---------------------------------------------------------------------------

# longer synthetic sequences than the FIM gate so k spans multiple
# segments (n ∈ [3, 151] → k up to 7 at rate 15 / span 3)
_SC_N = "(doc_id % 149) + 3"
_SC_TOK = (
    f"list_transform(range(0, {_SC_N}), "
    "i -> CAST((doc_id * 7 + i * 13) % 50000 AS INTEGER))"
)


@query(
    "span_corruption",
    f"""
    WITH docs AS (
      SELECT doc_id, CAST({_SC_N} AS INT) AS n, {_SC_TOK} AS t
      FROM documents
    ),
    k AS (
      SELECT doc_id, n, t,
             n >= 8 AS eligible,
             greatest(1, least(n * 15 // 300, n // 3, 100)) AS k
      FROM docs
    ),
    s AS (SELECT doc_id, n, t, eligible, k, n // k AS seg FROM k),
    built AS (
      SELECT doc_id, eligible,
        CASE WHEN eligible THEN
          flatten(list_transform(range(0, k), i ->
            t[i*seg+1 : i*seg +
              ({_H32.format(x="CAST(doc_id AS VARCHAR) || ':spanc:' || CAST(i AS VARCHAR)")}
               % greatest(seg - 2, 1))]
            || [CAST(32099 - i AS INTEGER)]
            || t[i*seg +
                 ({_H32.format(x="CAST(doc_id AS VARCHAR) || ':spanc:' || CAST(i AS VARCHAR)")}
                  % greatest(seg - 2, 1)) + 4
               : CASE WHEN i = k - 1 THEN n ELSE (i+1)*seg END]))
        ELSE t END AS inputs,
        CASE WHEN eligible THEN
          flatten(list_transform(range(0, k), i ->
            [CAST(32099 - i AS INTEGER)]
            || t[i*seg +
                 ({_H32.format(x="CAST(doc_id AS VARCHAR) || ':spanc:' || CAST(i AS VARCHAR)")}
                  % greatest(seg - 2, 1)) + 1
               : i*seg +
                 ({_H32.format(x="CAST(doc_id AS VARCHAR) || ':spanc:' || CAST(i AS VARCHAR)")}
                  % greatest(seg - 2, 1)) + 3]))
          || [CAST(32099 - k AS INTEGER)]
        ELSE CAST([] AS INTEGER[]) END AS targets
      FROM s
    )
    SELECT doc_id,
           md5(array_to_string(inputs, ',')) AS inputs_md5,
           md5(coalesce(array_to_string(targets, ','), '')) AS targets_md5,
           CAST(len(inputs) AS INT) AS n_input,
           CAST(len(targets) AS INT) AS n_target,
           eligible AS corrupted
    FROM built
    """,
)
def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption gate (`dataprep.span_corrupt`; Raffel et al.
    2020 §3.1.4): 15% of tokens in hash-placed fixed-length-3 spans per
    equal segment, inputs collapse each span to a descending sentinel,
    targets replay sentinel+span closed by a final sentinel. The driver
    canonicalizer can't sort raw arrays → md5-canonicalized payloads
    (token_chunking convention); raw arrays pinned by unit tests."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 149 + 3).cast("int")
    toks = FN.transform(
        FN.sequence(FN.lit(0), n - 1),
        lambda i: ((FN.col("doc_id") * 7 + i * 13) % 50000).cast("int"),
    )
    src = docs.select("doc_id", toks.alias("tokens"))
    out = D.span_corrupt(src, rate_pct=15, span_len=3, min_len=8)
    return out.select(
        "doc_id",
        FN.md5(
            FN.concat_ws(",", FN.col("inputs").cast("array<string>"))
        ).alias("inputs_md5"),
        FN.md5(
            FN.concat_ws(",", FN.col("targets").cast("array<string>"))
        ).alias("targets_md5"),
        "n_input",
        "n_target",
        "corrupted",
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (head / middle / tail)
# ---------------------------------------------------------------------------


@query(
    "perplexity_terciles",
    """
    WITH scored AS (
      SELECT doc_id, lang,
             CAST(n_chars * 100 + doc_id % 7 AS BIGINT) AS score
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY lang
                                ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY lang) AS cnt
      FROM scored
    )
    SELECT doc_id, lang, score,
           CAST(floor((rn - 1) * 3 / cnt) AS INT) AS bucket_idx,
           ['head', 'middle', 'tail'][CAST(floor((rn - 1) * 3 / cnt) AS INT) + 1]
             AS bucket
    FROM ranked
    """,
)
def perplexity_terciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing gate
    (`dataprep.perplexity_buckets`; Wenzek et al. 2020 §3): exact-rank
    terciles per language ordered by a deterministic quality score
    (production feeds `unigram_logprob_score`/`bigram_logprob_score`
    output — the gate's synthetic score isolates the ranking
    mechanics). Ties broken by doc_id so the assignment is total and
    engine-independent. The zero-shuffle literal-cutoff variant
    (`perplexity_bucket_by_cutoffs`) is unit-tested."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "doc_id",
        "lang",
        (FN.col("n_chars") * 100 + FN.col("doc_id") % 7)
        .cast("bigint")
        .alias("score"),
    )
    out = D.perplexity_buckets(
        scored, score_col="score", group_cols=("lang",), id_col="doc_id"
    )
    return out.select("doc_id", "lang", "score", "bucket_idx", "bucket")


# ---------------------------------------------------------------------------
# Tokenizer fertility / compression ratio
# ---------------------------------------------------------------------------

_TF_N = "(doc_id % 37) + 3"


@query(
    "tokenizer_fertility",
    f"""
    WITH d AS (
      SELECT doc_id, text,
             CAST({_TF_N} AS INT) AS n_tok,
             length(text) AS chars,
             octet_length(CAST(text AS BLOB)) AS bts,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS words
      FROM documents
    )
    SELECT doc_id,
           CAST(floor(chars * 10000 / greatest(n_tok, 1)) AS INT)
             AS chars_per_tok_bp,
           CAST(floor(bts * 10000 / greatest(n_tok, 1)) AS INT)
             AS bytes_per_tok_bp,
           CAST(floor(n_tok * 10000 / greatest(words, 1)) AS INT)
             AS toks_per_word_bp,
           n_tok > 0 AND words > 0
             AND floor(chars * 10000 / greatest(n_tok, 1)) >= 20000
             AND floor(n_tok * 10000 / greatest(words, 1)) <= 30000
             AS fertility_ok
    FROM d
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-compression quality gate
    (`dataprep.tokenizer_fertility`): chars/token, bytes/token and
    tokens/word in integer basis points over synthetic token counts —
    the bytes-per-token gibberish filter of FineWeb-style curation.
    Zero shuffle; thresholds chars/tok ≥ 2.0, tok/word ≤ 3.0."""
    from pyspark.sql import functions as FN

    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = (FN.col("doc_id") % 37 + 3).cast("int")
    src = docs.select(
        "doc_id",
        "text",
        FN.transform(
            FN.sequence(FN.lit(1), n), lambda i: i.cast("int")
        ).alias("tokens"),
    )
    out = D.tokenizer_fertility(src)
    return out.select(
        "doc_id",
        "chars_per_tok_bp",
        "bytes_per_tok_bp",
        "toks_per_word_bp",
        "fertility_ok",
    )


# ---------------------------------------------------------------------------
# Temperature-weighted source mixing
# ---------------------------------------------------------------------------

_TM_TOTAL = 200


@query(
    "temperature_mix",
    f"""
    WITH c AS (
      SELECT source, count(*) AS src_count FROM documents GROUP BY source
    ),
    w AS (
      SELECT source, src_count,
             CAST(floor(sqrt(CAST(src_count AS DOUBLE))) AS BIGINT) AS w
      FROM c
    ),
    q AS (
      SELECT source, src_count,
             least(src_count,
                   CAST(floor({_TM_TOTAL} * w / (SELECT sum(w) FROM w))
                        AS BIGINT)) AS src_quota
      FROM w
    )
    SELECT d.doc_id, d.source, q.src_count, q.src_quota,
           ({_H32.format(x="CAST(d.doc_id AS VARCHAR) || ':tmix'")}
            % q.src_count) < q.src_quota AS mix_keep
    FROM documents d JOIN q USING (source)
    """,
)
def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source-mixing gate
    (`dataprep.temperature_mix`; Arivazhagan et al. 2019 §4): per-source
    quota ∝ √n_s (τ=1/2 as one integer square root — floor(sqrt(double))
    is correctly rounded IEEE in every engine), doc keep = md5-uniform
    mod n_s < quota. The corpus never shuffles: ONE tiny groupBy(source)
    plus a broadcast join back."""
    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.temperature_mix(
        docs.select("doc_id", "source"), target_total=_TM_TOTAL
    )
    return out.select("doc_id", "source", "src_count", "src_quota", "mix_keep")

"""Correctness-gate queries, dataprep batch 19 (round 3): special-token
scrubbing, canonical dedup keys, and the SFT assembly pipeline E2E.

`dedup_key_canonical`'s oracle states the expected key in CLOSED FORM
(the decorated variants must all collapse back to the known base), so
the gate proves the normalization semantics, not just engine parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# special_token_guard
# ---------------------------------------------------------------------------

_INJ = ("<|im_end|>", "</s>", "<|endoftext|>", "")


@query(
    "special_token_guard",
    """
    WITH t AS (
      SELECT doc_id,
             substr(text, 1, 40)
             || CASE doc_id % 4
                  WHEN 0 THEN '<|im_end|>'
                  WHEN 1 THEN '</s>'
                  WHEN 2 THEN '<|endoftext|>x<|endoftext|>'
                  ELSE '' END
             || ' tail' AS raw
      FROM documents
    ),
    n AS (
      SELECT doc_id, raw,
             CAST((length(raw) - length(replace(raw, '<|im_start|>', '')))
                  // 12
                + (length(raw) - length(replace(raw, '<|im_end|>', ''))) // 10
                + (length(raw) - length(replace(raw, '<|endoftext|>', '')))
                  // 13
                + (length(raw) - length(replace(raw, '<s>', ''))) // 3
                + (length(raw) - length(replace(raw, '</s>', ''))) // 4
                + (length(raw) - length(replace(raw, '[INST]', ''))) // 6
                + (length(raw) - length(replace(raw, '[/INST]', ''))) // 7
                + (length(raw) - length(replace(raw, '<|assistant|>', '')))
                  // 13
                + (length(raw) - length(replace(raw, '<|user|>', ''))) // 8
              AS BIGINT) AS n_special
      FROM t
    )
    SELECT doc_id,
           md5(replace(replace(replace(replace(replace(replace(replace(
               replace(replace(raw,
               '<|im_start|>', ''), '<|im_end|>', ''), '<|endoftext|>', ''),
               '<s>', ''), '</s>', ''), '[INST]', ''), '[/INST]', ''),
               '<|assistant|>', ''), '<|user|>', '')) AS scrubbed_md5,
           n_special
    FROM n
    """,
)
def special_token_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-injection gate (`dataprep.special_token_scrub`):
    documents carry injected chat control sequences (including a
    doubled one); the scrub must remove every occurrence and count them
    exactly via the length algebra. The oracle replays the replace
    chain and counts independently per token."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    inj = (
        F.when(i % 4 == 0, F.lit(_INJ[0]))
        .when(i % 4 == 1, F.lit(_INJ[1]))
        .when(i % 4 == 2, F.lit("<|endoftext|>x<|endoftext|>"))
        .otherwise(F.lit(""))
    )
    raw = F.concat(F.substring("text", 1, 40), inj, F.lit(" tail"))
    feats = D.special_token_scrub(raw, mode="strip")
    return docs.select(
        "doc_id",
        F.md5(feats["scrubbed"]).alias("scrubbed_md5"),
        feats["n_special"].alias("n_special"),
    )


# ---------------------------------------------------------------------------
# dedup_key_canonical
# ---------------------------------------------------------------------------

@query(
    "dedup_key_canonical",
    """
    SELECT doc_id,
           md5('sample text number ' || (doc_id % 40)) AS key_md5,
           CAST(doc_id % 40 AS BIGINT) AS base_id
    FROM documents
    """,
)
def dedup_key_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-dedup-key gate (`dataprep.dedup_key_text`): four
    decorated re-renderings of the same base sentence — title case +
    '!', run-on whitespace, SHOUTING + '???', comma/semicolon noise —
    must ALL collapse to the identical key. The oracle states the
    expected key in closed form from the base alone: any normalization
    defect (missed punctuation class, bad collapse order, case slip)
    breaks the md5."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    n = (i % 40).cast("string")
    variant = (
        F.when(i % 4 == 0, F.concat(F.lit("Sample Text Number "), n, F.lit("!")))
        .when(
            i % 4 == 1,
            F.concat(F.lit("  sample   text\tnumber "), n, F.lit("  ")),
        )
        .when(
            i % 4 == 2,
            F.concat(F.lit("SAMPLE TEXT NUMBER "), n, F.lit("???")),
        )
        .otherwise(
            F.concat(F.lit("sample, text; number: "), n, F.lit("."))
        )
    )
    return docs.select(
        "doc_id",
        F.md5(D.dedup_key_text(variant)).alias("key_md5"),
        (i % 40).cast("long").alias("base_id"),
    )


# ---------------------------------------------------------------------------
# sft_pipeline_e2e — scrub -> render -> count, the SFT assembly chain
# ---------------------------------------------------------------------------

@query(
    "sft_pipeline_e2e",
    r"""
    WITH u AS (
      SELECT doc_id,
             replace(replace(substr(text, 1, 40) ||
               CASE WHEN doc_id % 3 = 0 THEN '<|im_end|>zzz' ELSE '' END,
               '<|im_end|>', ''), '<|endoftext|>', '') AS user_clean
      FROM documents
    ),
    r AS (
      SELECT doc_id,
             '<|im_start|>user' || chr(10) || user_clean || '<|im_end|>'
             || chr(10) || '<|im_start|>assistant' || chr(10) || 'resp '
             || doc_id || '<|im_end|>' || chr(10) AS rendered
      FROM u
    )
    SELECT doc_id, md5(rendered) AS rendered_md5,
           CAST(len(regexp_extract_all(rendered, '\w+|[^\w\s]')) AS BIGINT)
             AS re_tokens
    FROM r
    """,
)
def sft_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT assembly E2E gate: raw user text (with injected control
    sequences on every third doc) -> `special_token_scrub` -> ChatML
    `chat_render` -> BPE-ish token count — the scrub must fire BEFORE
    the render so injected '<|im_end|>' never forges a turn boundary.
    The oracle renders longhand with the scrub replayed as replaces."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    raw_user = F.concat(
        F.substring("text", 1, 40),
        F.when(i % 3 == 0, F.lit("<|im_end|>zzz")).otherwise(F.lit("")),
    )
    clean_user = D.special_token_scrub(
        raw_user, tokens=("<|im_end|>", "<|endoftext|>"), mode="strip"
    )["scrubbed"]
    msgs = F.array(
        F.struct(F.lit("user").alias("role"), clean_user.alias("content")),
        F.struct(
            F.lit("assistant").alias("role"),
            F.concat(F.lit("resp "), i.cast("string")).alias("content"),
        ),
    )
    rendered = D.chat_render(msgs, template="chatml")
    counts = D.token_counts(rendered)
    return docs.select(
        "doc_id",
        F.md5(rendered).alias("rendered_md5"),
        counts["re_tokens"].cast("long").alias("re_tokens"),
    )

"""Correctness-gate queries, dataprep batch 15 (round 3): character-
entropy quality signal, n-gram overlap scoring, chat-template rendering.

`char_entropy_quality` and `ngram_overlap_score` replay the integer
formulas with DuckDB list functions (same math, different engine);
`chat_template_render`'s oracle writes the rendered string out LONGHAND
(plain concatenation, no list machinery), so it is a fully independent
derivation of the template semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# char_entropy_quality
# ---------------------------------------------------------------------------

_ENT_N = 160


@query(
    "char_entropy_quality",
    f"""
    WITH s AS (
      SELECT doc_id, substr(text, 1, {_ENT_N}) AS s FROM documents
    ),
    c AS (
      SELECT doc_id, length(s) AS n,
             list_transform(range(1, length(s) + 1),
                            i -> substr(s, CAST(i AS INT), 1)) AS chars
      FROM s
    ),
    u AS (SELECT *, list_distinct(chars) AS uniq FROM c),
    k AS (
      SELECT doc_id, n, uniq,
             list_transform(uniq,
               d -> len(list_filter(chars, ch -> ch = d))) AS counts
      FROM u
    ),
    e AS (
      SELECT doc_id, n, uniq,
             CASE WHEN n = 0 THEN 0
                  ELSE list_sum(list_transform(counts,
                         c -> c * (length(bin(n // c)) - 1))) END AS ent
      FROM k
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_sampled,
           CAST(CASE WHEN n = 0 THEN 0 ELSE len(uniq) END AS BIGINT)
             AS n_distinct_chars,
           CAST(ent AS BIGINT) AS entropy_q,
           CAST(CASE WHEN n = 0 THEN 0 ELSE (ent * 100) // n END AS BIGINT)
             AS entropy_cb
    FROM e
    """,
)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-entropy gate (`dataprep.char_entropy_features`): quantized
    Shannon entropy of each document's character distribution over a
    bounded prefix — integer bit-length arithmetic end to end, replayed
    with DuckDB list functions. Zero shuffle (scan + map)."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = D.char_entropy_features(F.col("text"), max_chars=_ENT_N)
    return docs.select(
        "doc_id", *[v.alias(k) for k, v in feats.items()]
    )


# ---------------------------------------------------------------------------
# ngram_overlap_score
# ---------------------------------------------------------------------------

def _grams_sql(w: str, n: int = 2) -> str:
    """DuckDB expression: distinct word n-grams of word-list `w`."""
    return (
        f"CASE WHEN len({w}) >= {n} THEN list_distinct(list_transform("
        f"range(1, len({w}) - {n - 1} + 1), "
        f"i -> array_to_string({w}[CAST(i AS INT):CAST(i + {n - 1} AS INT)],"
        f" ' '))) ELSE [] END"
    )


_B_SQL = (
    "(array_to_string(string_split(text, ' ')[1:25], ' ') "
    "|| ' q' || (doc_id % 7) || ' q' || ((doc_id + 1) % 7))"
)


@query(
    "ngram_overlap_score",
    f"""
    WITH g AS (
      SELECT doc_id,
             {_grams_sql("string_split(text, ' ')")} AS ga,
             {_grams_sql(f"string_split({_B_SQL}, ' ')")} AS gb
      FROM documents
    ),
    m AS (
      SELECT doc_id, len(ga) AS na, len(gb) AS nb,
             len(list_filter(ga, x -> list_contains(gb, x))) AS inter
      FROM g
    ),
    bp AS (
      SELECT doc_id,
             CAST(na AS BIGINT) AS n_grams_a,
             CAST(nb AS BIGINT) AS n_grams_b,
             CAST(inter AS BIGINT) AS n_overlap,
             CAST(CASE WHEN na > 0 THEN (inter * 10000) // na ELSE 0 END
                  AS BIGINT) AS precision_bp,
             CAST(CASE WHEN nb > 0 THEN (inter * 10000) // nb ELSE 0 END
                  AS BIGINT) AS recall_bp
      FROM m
    )
    SELECT *, CAST(CASE WHEN precision_bp + recall_bp > 0
                        THEN (2 * precision_bp * recall_bp)
                             // (precision_bp + recall_bp)
                        ELSE 0 END AS BIGINT) AS f1_bp
    FROM bp
    """,
)
def ngram_overlap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram overlap gate (`dataprep.ngram_overlap_features`): each
    document scored against a deterministic mutation of itself (25-word
    prefix + junk suffix) — the distillation regurgitation/drift filter.
    Bigram set precision/recall/F1 in integer basis points; DuckDB
    replays with its own list machinery. Zero shuffle."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = F.concat(
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 25), " "),
        F.lit(" q"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(" q"),
        ((F.col("doc_id") + 1) % 7).cast("string"),
    )
    feats = D.ngram_overlap_features(F.col("text"), b, n=2)
    return docs.select("doc_id", *[v.alias(k) for k, v in feats.items()])


# ---------------------------------------------------------------------------
# chat_template_render
# ---------------------------------------------------------------------------

@query(
    "chat_template_render",
    """
    SELECT doc_id,
           md5('<|im_start|>system' || chr(10) || 'sys ' || source
            || '<|im_end|>' || chr(10)
            || '<|im_start|>user' || chr(10) || substr(text, 1, 40)
            || '<|im_end|>' || chr(10)
            || '<|im_start|>assistant' || chr(10) || 'resp ' || doc_id
            || '<|im_end|>' || chr(10)) AS chatml_md5,
           CAST(length('<|im_start|>system' || chr(10) || 'sys ' || source
            || '<|im_end|>' || chr(10)
            || '<|im_start|>user' || chr(10) || substr(text, 1, 40)
            || '<|im_end|>' || chr(10)
            || '<|im_start|>assistant' || chr(10) || 'resp ' || doc_id
            || '<|im_end|>' || chr(10)) AS BIGINT) AS chatml_len,
           md5('system: sys ' || source || chr(10)
            || 'user: ' || substr(text, 1, 40) || chr(10)
            || 'assistant: resp ' || doc_id || chr(10)
            || 'assistant: ') AS colon_gen_md5
    FROM documents
    """,
)
def chat_template_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template gate (`dataprep.chat_render`): a 3-turn
    conversation synthesized per document, rendered as ChatML and as
    the colon format with a generation prompt. The oracle writes both
    rendered strings out LONGHAND — plain concatenation, no list
    machinery — so any template/ordering/separator defect in the
    array-based operator breaks the md5. Zero shuffle."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    msgs = F.array(
        F.struct(
            F.lit("system").alias("role"),
            F.concat(F.lit("sys "), F.col("source")).alias("content"),
        ),
        F.struct(
            F.lit("user").alias("role"),
            F.substring("text", 1, 40).alias("content"),
        ),
        F.struct(
            F.lit("assistant").alias("role"),
            F.concat(F.lit("resp "), F.col("doc_id").cast("string")).alias(
                "content"
            ),
        ),
    )
    chatml = D.chat_render(msgs, template="chatml")
    colon = D.chat_render(msgs, template="colon", add_generation_prompt=True)
    return docs.select(
        "doc_id",
        F.md5(chatml).alias("chatml_md5"),
        F.length(chatml).cast("long").alias("chatml_len"),
        F.md5(colon).alias("colon_gen_md5"),
    )

"""Correctness-gate queries, dataprep batch 4 (round 3): BPE tokenizer.

The gate pins the full greedy-BPE encode path against a DuckDB oracle
by choosing a merges table of DISJOINT single-character pairs. Under
that restriction greedy rank-order BPE is exactly equivalent to a
chain of left-to-right non-overlapping string replaces (no pair can
overlap itself since left≠right, no two merges share a character, and
no merged token re-enters a later merge) — so the oracle can replay the
merge chain with `replace()` at the character level, placeholder chars
standing in for merged tokens. The Spark side runs the REAL general
encoder (`operators/tokenizer.py`: rank loop, cascading merges, word
memo); the general cascading behavior the oracle cannot express is
pinned by hand-computed goldens in tests/test_tokenizer.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_MERGES = [("t", "h"), ("e", "r"), ("i", "n"), ("o", "u"), ("a", "l"), ("c", "k")]


@query(
    "bpe_tokenize",
    """
    WITH c AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z ]+', '', 'g'),
                                 ' +', ' ', 'g')) AS clean
      FROM documents
    ), p AS (
      SELECT doc_id, clean,
             replace(replace(replace(replace(replace(replace(replace(clean, ' ', '_'),
               'th','1'),'er','2'),'in','3'),'ou','4'),'al','5'),'ck','6') AS ph
      FROM c
    ), s AS (
      SELECT doc_id, clean, ph,
             trim(regexp_replace(ph, '(.)', '\\1 ', 'g')) AS spaced
      FROM p
    )
    SELECT doc_id,
           length(ph) AS n_tok,
           md5(replace(replace(replace(replace(replace(replace(spaced,
             '1','th'),'2','er'),'3','in'),'4','ou'),'5','al'),'6','ck'))
             AS tok_md5,
           length(clean) AS n_chars
    FROM s
    """,
)
def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode over `documents.text` with a fixed six-merge table
    (th/er/in/ou/al/ck — the most frequent English bigrams). Output is
    driver-canonicalizable scalars only: token count, md5 of the
    space-joined token sequence (word boundaries as `_` tokens), and
    the cleaned char count for the compression-ratio denominator."""
    from logstash_spark.operators.tokenizer import bpe_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z ]+", ""), " +", " "
        )
    )
    out = bpe_encode(docs.withColumn("clean", clean), "clean", _MERGES, word_sep="_")
    return out.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_tok"),
        F.md5(F.concat_ws(" ", "bpe_tokens")).alias("tok_md5"),
        F.length("clean").alias("n_chars"),
    )

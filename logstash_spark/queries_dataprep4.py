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
from logstash_spark.queries_dataprep import (
    _SHINGLES_FALLBACK_SQL,
    _SIG_SQL,
)

_MERGES = [("t", "h"), ("e", "r"), ("i", "n"), ("o", "u"), ("a", "l"), ("c", "k")]

# corpus = the documents table as-is; new shard = 2/3-prefix variants
# (ids offset by +100000) simulating a freshly landed crawl shard that
# near-duplicates existing corpus docs.
_CROSS_CORPUS_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         array_to_string(w[1:greatest(2*len(w)//3, 1)], ' ') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


@query(
    "dedupe_minhash_cross",
    f"""
    WITH corpus AS ({_CROSS_CORPUS_SQL}),
    sh AS ({_SHINGLES_FALLBACK_SQL}),
    sig AS (SELECT doc_id, sh, [{_SIG_SQL}] AS sig FROM sh),
    banded AS (
      SELECT doc_id, sh, b.band,
             md5(CAST(sig[b.band*2 + 1] AS VARCHAR) || '_' ||
                 CAST(sig[b.band*2 + 2] AS VARCHAR)) AS key
      FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band) b
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS new_id, r.doc_id AS corpus_id,
                      l.sh AS sha, r.sh AS shb
      FROM banded l
      JOIN banded r ON l.band = r.band AND l.key = r.key
      WHERE l.doc_id >= 100000 AND r.doc_id < 100000
    ),
    scored AS (
      SELECT new_id, corpus_id,
             round(CAST(len(list_filter(sha, x -> list_contains(shb, x))) AS DOUBLE)
                   / (len(sha) + len(shb)
                      - len(list_filter(sha, x -> list_contains(shb, x)))), 4) AS jaccard
      FROM cand
    )
    SELECT new_id, corpus_id, jaccard FROM scored WHERE jaccard >= 0.5
    """,
)
def dedupe_minhash_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-corpus MinHash-LSH dedup: a new shard (2/3-prefix
    variants of existing docs, ids +100000) matched against the EXISTING
    corpus's persisted signature table — no corpus self-join, corpus
    never re-shingled. The gate disables the hot-bucket representative
    guard (max_bucket > corpus size) so the all-pairs band-join DuckDB
    oracle stays valid; the guard is pinned by unit tests."""
    from logstash_spark.operators.dataprep import (
        minhash_lsh_pairs_cross,
        shingle_sig_table,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    w = F.split(F.col("text"), " ")
    cut = F.greatest(F.floor(F.size(w) * 2 / 3).cast("int"), F.lit(1))
    shard = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(" ", F.slice(w, 1, cut)).alias("text"),
    )
    corpus_sig = shingle_sig_table(docs, "doc_id", "text", n=3, k=8, short_doc="whole_text")
    return minhash_lsh_pairs_cross(
        shard, corpus_sig, "doc_id", "text",
        n=3, k=8, bands=4, threshold=0.5,
        max_bucket=10**9, short_doc="whole_text",
    )


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
    SELECT s.doc_id,
           length(s.ph) AS n_tok,
           md5(replace(replace(replace(replace(replace(replace(s.spaced,
             '1','th'),'2','er'),'3','in'),'4','ou'),'5','al'),'6','ck'))
             AS tok_md5,
           length(s.clean) AS n_chars,
           md5(coalesce(array_to_string(
             list_filter(regexp_split_to_array(d.text, '\\s+'), x -> x != ''),
             ' '), '')) AS decoded_md5,
           TRUE AS roundtrip_ok
    FROM s JOIN documents d USING (doc_id)
    """,
)
def bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encode + decode inversion in ONE gate (folded from the former
    separate `bpe_roundtrip` per the r03 verdict's gate-budget advice —
    both halves share the documents scan and doc_id key).

    Encode half: `bpe_encode` over cleaned text with a fixed six-merge
    table (th/er/in/ou/al/ck — the most frequent English bigrams);
    token count, md5 of the space-joined token sequence (word boundaries
    as `_` tokens), cleaned char count for the compression-ratio
    denominator. Roundtrip half: decode(encode(RAW text)) must equal the
    whitespace-normalized input for EVERY row — `bpe_decode` is pure
    column algebra (boundary token → space, concat), and the oracle is
    md5 of the normalized input itself, fully independent of the
    tokenizer; the boolean recomputes equality Spark-side as a second
    witness."""
    from logstash_spark.operators.tokenizer import bpe_decode, bpe_encode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z ]+", ""), " +", " "
        )
    )
    out = bpe_encode(docs.withColumn("clean", clean), "clean", _MERGES, word_sep="_")
    enc = bpe_encode(docs, "text", _MERGES)  # default '▁' boundary token
    dec = bpe_decode(enc, "bpe_tokens")
    # any-whitespace normalization, matching Python str.split() in encode
    norm = F.concat_ws(
        " ", F.filter(F.split(F.col("text"), "\\s+"), lambda x: x != "")
    )
    rt = dec.select(
        "doc_id",
        F.md5(F.col("text_decoded")).alias("decoded_md5"),
        (F.col("text_decoded") == norm).alias("roundtrip_ok"),
    )
    return out.select(
        "doc_id",
        F.size("bpe_tokens").alias("n_tok"),
        F.md5(F.concat_ws(" ", "bpe_tokens")).alias("tok_md5"),
        F.length("clean").alias("n_chars"),
    ).join(rt, "doc_id")

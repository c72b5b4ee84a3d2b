"""Correctness-gate queries, dataprep batch 14 (round 3): the Unicode
corpus normalizer, K-wise ranking -> pairwise preference expansion, and
CCNet-style corpus-wide paragraph dedup.

`text_clean_normalize` replays the module's own SQL rendering
(`webtext.clean_text_sql`, generated from the same constant tables), so
the gate proves cross-engine regex/replace parity — correctness of the
individual steps is pinned by golden unit tests. The other two gates use
INDEPENDENT DuckDB derivations (self-join for pairs, window keep-first
for paragraph dedup), so they check semantics, not just parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import webtext as W
from logstash_spark.queries import query

# the deterministic 32-bit hash both engines replay (dataprep
# portable_hash32): int(md5(s)[:8], 16)
_H32 = "CAST(('0x' || substr(md5({s}), 1, 8))::UBIGINT AS BIGINT)"


def _dq(s: str) -> str:
    """Render a Python string as a DuckDB expression: printable chunks
    as standard quoted literals (UTF-8 passes through), control chars
    via chr(n) so the oracle SQL text stays free of raw control bytes."""
    if s == "":
        return "''"
    parts: list[str] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            parts.append("'" + "".join(buf).replace("'", "''") + "'")
            buf.clear()

    for ch in s:
        if ord(ch) < 0x20:
            flush()
            parts.append(f"chr({ord(ch)})")
        else:
            buf.append(ch)
    flush()
    return " || ".join(parts) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# text_clean_normalize — the Unicode corpus normalizer
# ---------------------------------------------------------------------------

#: deterministic junk injected per doc_id % 4: smart quotes + NBSP +
#: dashes + ellipsis + CRLF; zero-width family + ideographic space + VT;
#: run-on spaces/tabs + excess breaks + guillemets + soft hyphen; clean.
_JUNK = (
    " ‘q’ – x…\r\n",
    "​z‌ “w”　t",
    "  a\tb \n\n\n\n«g»­",
    "",
)


def _junk_case_sql(col: str) -> str:
    arms = " ".join(
        f"WHEN {k} THEN {_dq(j)}" for k, j in enumerate(_JUNK)
    )
    return f"(CASE {col} % 4 {arms} END)"


def _messy_sql() -> str:
    return (
        f"('P ' || {_junk_case_sql('doc_id')} || substr(text, 1, 50) || ' ' "
        f"|| {_junk_case_sql('(doc_id + 1)')} || ' Q')"
    )


@query(
    "text_clean_normalize",
    f"""
    SELECT doc_id,
           md5({W.clean_text_sql(_messy_sql())}) AS clean_md5,
           CAST(length({W.clean_text_sql(_messy_sql())}) AS BIGINT)
             AS clean_len
    FROM documents
    """,
)
def text_clean_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode cleanup gate (`webtext.clean_text`): every document is
    wrapped in deterministic typographic junk — smart quotes, NBSP and
    the zero-width family, CRLF/VT line separators, run-on whitespace,
    guillemets, soft hyphens — and the cleaned text must md5-match the
    oracle's replay of the same fixed replace/regexp chain. Zero
    shuffle: the whole query is scan + map."""

    def junk_case(col) -> F.Column:
        expr = F.lit(_JUNK[3])
        for k in (2, 1, 0):
            expr = F.when(col % 4 == k, F.lit(_JUNK[k])).otherwise(expr)
        return expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    messy = F.concat(
        F.lit("P "),
        junk_case(F.col("doc_id")),
        F.substring("text", 1, 50),
        F.lit(" "),
        junk_case(F.col("doc_id") + 1),
        F.lit(" Q"),
    )
    clean = W.clean_text(messy)
    return docs.select(
        "doc_id",
        F.md5(clean).alias("clean_md5"),
        F.length(clean).cast("long").alias("clean_len"),
    )


# ---------------------------------------------------------------------------
# kwise_pref_pairs — K-wise ranking -> all pairwise preferences
# ---------------------------------------------------------------------------

@query(
    "kwise_pref_pairs",
    f"""
    WITH c AS (
      SELECT doc_id // 8 AS prompt_id, doc_id,
             {_H32.format(s="doc_id || ':kw'")} % 100 AS score
      FROM documents
    ),
    n AS (SELECT prompt_id, count(*) AS n_candidates FROM c GROUP BY 1),
    p AS (
      SELECT a.prompt_id,
             a.doc_id AS chosen_id, b.doc_id AS rejected_id,
             a.score AS chosen_score, b.score AS rejected_score,
             a.score - b.score AS margin
      FROM c a JOIN c b ON a.prompt_id = b.prompt_id
        AND (a.score > b.score
             OR (a.score = b.score AND a.doc_id > b.doc_id))
        AND a.score - b.score >= 7
    ),
    r AS (
      SELECT *, row_number() OVER (
               PARTITION BY prompt_id
               ORDER BY chosen_score DESC, chosen_id DESC,
                        rejected_score DESC, rejected_id DESC
             ) AS pair_rank
      FROM p
    )
    SELECT r.prompt_id, chosen_id, rejected_id, chosen_score,
           rejected_score, margin, CAST(pair_rank AS BIGINT) AS pair_rank,
           CAST(n.n_candidates AS BIGINT) AS n_candidates
    FROM r JOIN n ON r.prompt_id = n.prompt_id
    WHERE pair_rank <= 5
    """,
)
def kwise_pref_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-wise preference expansion gate (`dataprep.kwise_pairs`):
    synthetic reward scores over 8-candidate prompt groups, all pairs
    with margin >= 7, capped at 5 pairs per prompt best-first. The
    oracle derives the pair set INDEPENDENTLY via a self-join +
    row_number replay of the (score DESC, id DESC) total order — the
    array-local expansion must agree with the relational definition."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cands = docs.select(
        F.expr("doc_id DIV 8").alias("prompt_id"),
        "doc_id",
        (
            D.portable_hash32(
                F.concat(F.col("doc_id").cast("string"), F.lit(":kw"))
            )
            % 100
        ).alias("score"),
    )
    out = D.kwise_pairs(
        cands, min_margin=7, max_pairs_per_group=5
    )
    return out.select(
        "prompt_id",
        "chosen_id",
        "rejected_id",
        "chosen_score",
        "rejected_score",
        "margin",
        F.col("pair_rank").cast("long").alias("pair_rank"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
    )


# ---------------------------------------------------------------------------
# paragraph_dedup_global — CCNet corpus-wide keep-first paragraph dedup
# ---------------------------------------------------------------------------

_P0 = "'para ' || substr(md5('pp' || (doc_id % 17)), 1, 16)"
_P1 = "'para ' || substr(md5('pp' || ((doc_id * 7 + 3) % 17)), 1, 16)"
_P2 = "'unique ' || doc_id"


@query(
    "paragraph_dedup_global",
    f"""
    WITH d AS (
      SELECT doc_id, {_P0} AS p0, {_P1} AS p1, {_P2} AS p2 FROM documents
    ),
    x AS (
      SELECT doc_id, 0 AS ix, p0 AS p FROM d
      UNION ALL SELECT doc_id, 1, p1 FROM d
      UNION ALL SELECT doc_id, 2, p2 FROM d
    ),
    k AS (
      SELECT *, row_number() OVER (
               PARTITION BY p ORDER BY doc_id, ix
             ) AS rn
      FROM x
    ),
    agg AS (
      SELECT doc_id,
             string_agg(p, chr(10) || chr(10) ORDER BY ix) AS text,
             count(*) AS n_kept
      FROM k WHERE rn = 1 GROUP BY doc_id
    )
    SELECT doc_id, md5(text) AS text_md5,
           CAST(3 AS BIGINT) AS n_paras,
           CAST(n_kept AS BIGINT) AS n_kept
    FROM agg
    """,
)
def paragraph_dedup_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph-dedup gate (`dataprep.
    dedup_paragraphs_global`): every document carries two paragraphs
    drawn from a 17-slot pool (heavily repeated across docs, sometimes
    within one doc) plus one unique paragraph. First global occurrence
    by (doc_id, index) survives; documents are reassembled in paragraph
    order. The oracle is an INDEPENDENT window keep-first derivation
    keyed on the paragraph text itself, so it also proves the op's
    32-bit paragraph hashing is collision-clean on this corpus."""
    from logstash_spark.operators import dataprep as D  # noqa: PLC0415

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    i = F.col("doc_id")
    p0 = F.concat(
        F.lit("para "), F.substring(F.md5(F.concat(F.lit("pp"), (i % 17).cast("string"))), 1, 16)
    )
    p1 = F.concat(
        F.lit("para "),
        F.substring(F.md5(F.concat(F.lit("pp"), ((i * 7 + 3) % 17).cast("string"))), 1, 16),
    )
    p2 = F.concat(F.lit("unique "), i.cast("string"))
    built = docs.select(
        "doc_id",
        F.concat_ws("\n\n", p0, p1, p2).alias("text"),
    )
    out = D.dedup_paragraphs_global(built)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        "n_paras",
        "n_kept",
    )

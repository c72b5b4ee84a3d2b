"""Correctness-gate queries, dataprep batch 6 (round 3, late):

* `hll_cardinality` — the mergeable HyperLogLog sketch (operators/
  sketch.py): registers, scaled harmonic sum, and the estimate are all
  integer algebra over the md5 hash, so both engines agree bit-for-bit
  (the Spark side builds the sketch from two shards and MERGES them,
  proving merge == single-pass; the oracle single-passes).
* `c4_fineweb_line_rules` — C4 §2.2 line filtering + FineWeb-style
  line-ratio metrics over synthesized lines (6-word chunks decorated
  with terminal punctuation / bullets; lorem-ipsum and curly-brace
  kill-rows injected on doc_id % 17 / % 19).
* `embed_decontam_flags` — embedding-cosine eval-set decontamination:
  the eval set collapses to plan-time literal unit directions (corpus
  never shuffles); the oracle replays the identical IEEE fold via a
  cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D
from logstash_spark.operators import sketch as SK
from logstash_spark.queries import query
from logstash_spark.queries_dataprep import _DOT_SQL

# ---------------------------------------------------------------------------
# HyperLogLog cardinality
# ---------------------------------------------------------------------------

_HLL_LOW = SK.hll_oracle_sql(
    "user_id", "(SELECT event_type AS group_key, user_id FROM events)",
    groups=["group_key"], p=8,
)
_HLL_HIGH = SK.hll_oracle_sql(
    "event_id",
    "(SELECT '_all_event_ids' AS group_key, event_id FROM events)",
    groups=["group_key"], p=8,
)


@query(
    "hll_cardinality",
    f"""
    WITH a AS ({_HLL_LOW}),
    b AS ({_HLL_HIGH}),
    ex AS (
      SELECT event_type AS group_key, count(DISTINCT user_id) AS exact_n
      FROM events GROUP BY 1
      UNION ALL
      SELECT '_all_event_ids', count(DISTINCT event_id) FROM events
    )
    SELECT u.group_key, u.v_empty, u.s_scaled, u.est_x1e6,
           CAST(ex.exact_n AS BIGINT) AS exact_n
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b) u
    JOIN ex USING (group_key)
    """,
)
def hll_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL cardinality: distinct user_id per event_type (the
    small-range regime — `v_empty` ships so a consumer can apply linear
    counting) plus distinct event_id overall (the regime where the raw
    estimator is accurate). The Spark side sketches TWO shards
    (event_id parity) and merges them — registers are max-mergeable, so
    the merged sketch is bit-identical to the oracle's single pass.
    At 100 TB: each shard emits only m=256 partial rows per group; the
    global distinct count never re-scans the data."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s0 = SK.hll_sketch(
        ev.filter(F.col("event_id") % 2 == 0), "user_id", ["event_type"], p=8
    )
    s1 = SK.hll_sketch(
        ev.filter(F.col("event_id") % 2 == 1), "user_id", ["event_type"], p=8
    )
    low = SK.hll_estimate(SK.hll_merge(s0, s1), ["event_type"], p=8).join(
        ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("exact_n")
        ),
        "event_type",
    ).select(
        F.col("event_type").alias("group_key"),
        "v_empty", "s_scaled", "est_x1e6", "exact_n",
    )
    allg = ev.withColumn("group_key", F.lit("_all_event_ids"))
    high = SK.hll_estimate(
        SK.hll_sketch(allg, "event_id", ["group_key"], p=8), ["group_key"], p=8
    ).crossJoin(
        ev.agg(F.countDistinct("event_id").alias("exact_n"))
    ).select("group_key", "v_empty", "s_scaled", "est_x1e6", "exact_n")
    return low.unionByName(high)


# ---------------------------------------------------------------------------
# C4 / FineWeb line rules over synthesized lines
# ---------------------------------------------------------------------------

_LINES_SQL = """
  SELECT doc_id,
         array_to_string(list_transform(range(0, (len(w) + 5) // 6), i ->
           CASE WHEN i % 3 = 0
                  THEN array_to_string(w[i*6+1 : i*6+6], ' ') || '.'
                WHEN i % 3 = 1
                  THEN '- ' || array_to_string(w[i*6+1 : i*6+6], ' ')
                ELSE array_to_string(w[i*6+1 : i*6+6], ' ') END), '|')
         || CASE WHEN doc_id % 17 = 0 THEN '|lorem ipsum dolor sit amet filler.' ELSE '' END
         || CASE WHEN doc_id % 19 = 0 THEN '|code { brace block here today.' ELSE '' END
         AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
"""


@query(
    "c4_fineweb_line_rules",
    f"""
    WITH doc2 AS ({_LINES_SQL}),
    lx AS (
      SELECT doc_id, text,
             list_filter(list_transform(string_split(text, '|'), x -> trim(x)),
                         x -> x != '') AS ls
      FROM doc2
    ),
    m AS (
      SELECT doc_id, text, ls, len(ls) AS n_lines,
             len(list_filter(ls, x ->
               list_contains(['.', '!', '?', '"'], substr(x, -1, 1)))) AS term,
             len(list_filter(ls, x ->
               list_contains(['- ', '* ', '• '], substr(x, 1, 2)))) AS bullet,
             len(list_filter(ls, x -> len(string_split(x, ' ')) < 3)) AS short,
             list_reduce(list_prepend(0,
               list_transform(ls, x -> len(string_split(x, ' ')))),
               (a, b) -> a + b) AS n_words,
             list_filter(ls, x ->
               list_contains(['.', '!', '?', '"'], substr(x, -1, 1))
               AND len(string_split(x, ' ')) >= 5) AS kept
      FROM lx
    )
    SELECT doc_id,
           CAST(n_lines AS INTEGER) AS n_lines,
           CAST(n_words AS INTEGER) AS n_words,
           round(CAST(term AS DOUBLE) / greatest(n_lines, 1), 4) AS frac_term_punct,
           round(CAST(bullet AS DOUBLE) / greatest(n_lines, 1), 4) AS frac_bullet,
           round(CAST(short AS DOUBLE) / greatest(n_lines, 1), 4) AS frac_short,
           contains(lower(text), 'lorem ipsum') AS has_lorem,
           contains(text, '{{') AS has_curly,
           md5(array_to_string(kept, '|')) AS text_clean_md5,
           CAST(len(kept) AS INTEGER) AS n_kept,
           (len(kept) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
            AND NOT contains(text, '{{')) AS doc_keep
    FROM m
    """,
)
def c4_fineweb_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 line filter + FineWeb line-ratio metrics. Lines are
    synthesized deterministically from the documents table (6-word
    chunks; every 3rd ends in '.', every 3rd+1 is a '- ' bullet) with
    lorem/curly kill-rows injected at doc_id % 17 / % 19. Everything is
    array-local column algebra — the corpus never shuffles."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.col("text"), " ")
    nch = F.ceil(F.size(w) / F.lit(6)).cast("int")

    def _line(i):
        chunk = F.concat_ws(" ", F.slice(w, i * 6 + 1, 6))
        return (
            F.when(i % 3 == 0, F.concat(chunk, F.lit(".")))
            .when(i % 3 == 1, F.concat(F.lit("- "), chunk))
            .otherwise(chunk)
        )

    text2 = F.concat(
        F.concat_ws("|", F.transform(F.sequence(F.lit(0), nch - 1), _line)),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.lit("|lorem ipsum dolor sit amet filler."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 19 == 0,
            F.lit("|code { brace block here today."),
        ).otherwise(F.lit("")),
    )
    doc2 = docs.select("doc_id", text2.alias("text"))
    out = D.line_quality_rules(doc2, "text", line_sep="|")
    out = D.c4_line_filter(out, "text", target="text_clean", line_sep="|")
    return out.select(
        "doc_id", "n_lines", "n_words", "frac_term_punct", "frac_bullet",
        "frac_short", "has_lorem", "has_curly",
        F.md5(F.col("text_clean")).alias("text_clean_md5"),
        "n_kept", "doc_keep",
    )


# ---------------------------------------------------------------------------
# Embedding-cosine eval-set decontamination
# ---------------------------------------------------------------------------

_DECON_THR = 0.99

_EUNIT_SQL = (
    "list_transform(e_vec, x -> CAST(x AS DOUBLE) / "
    f"sqrt({_DOT_SQL.format(a='e_vec', b='e_vec')}))"
)
_CORP_DOT_UNIT = (
    "list_reduce(list_prepend(0.0, list_transform(list_zip(embedding, e_unit), "
    "z -> CAST(z[1] AS DOUBLE) * z[2])), (p, q) -> p + q)"
)


@query(
    "embed_decontam_flags",
    f"""
    WITH evn AS (
      SELECT vec_id AS e_id, {_EUNIT_SQL} AS e_unit
      FROM (SELECT vec_id, embedding AS e_vec FROM embeddings WHERE vec_id < 20)
    ),
    c AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 20
      UNION ALL
      SELECT vec_id + 200000, embedding FROM embeddings WHERE vec_id < 10
    ),
    s AS (
      SELECT c.vec_id,
             {_CORP_DOT_UNIT} /
             sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS cos
      FROM c, evn
    )
    SELECT vec_id,
           round(max(cos), 6) AS max_eval_cos,
           CAST(count(*) FILTER (WHERE cos >= {_DECON_THR}) AS INTEGER) AS n_contam_hits,
           max(cos) >= {_DECON_THR} AS contaminated
    FROM s GROUP BY vec_id
    """,
)
def embed_decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination: eval = vec_id < 20
    (collapsed to literal unit directions — zero shuffle, no join),
    corpus = the rest plus planted copies of the first 10 eval vectors
    at vec_id+200000 (cos == 1 → contaminated). Rounded to 6 dp; the
    hit count and flag compare the UN-rounded cosine on both engines,
    which are bit-identical by IEEE-fold construction."""
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eval_df = em.filter(F.col("vec_id") < 20)
    corpus = em.filter(F.col("vec_id") >= 20).select("vec_id", "embedding").unionByName(
        em.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
        )
    )
    return D.embed_decontam(corpus, eval_df, threshold=_DECON_THR).select(
        "vec_id", "max_eval_cos", "n_contam_hits", "contaminated"
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W = 4, 32  # small width → visible collisions at sf0.01

_CMS_EST = SK.cms_oracle_sql(
    "CAST(user_id AS VARCHAR)",
    "events",
    "SELECT CAST(range AS VARCHAR) AS key FROM range(10)",
    d=_CMS_D,
    w=_CMS_W,
)


@query(
    "cms_frequency",
    f"""
    WITH est AS ({_CMS_EST}),
    ex AS (
      SELECT CAST(user_id AS VARCHAR) AS key, CAST(count(*) AS BIGINT) AS exact_n
      FROM events GROUP BY 1
    )
    SELECT est.key, est.est, coalesce(ex.exact_n, 0) AS exact_n
    FROM est LEFT JOIN ex USING (key)
    """,
)
def cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency upper bounds for probe keys user_id 0..9,
    deliberately narrow (w=32) so collisions over-count and the gate
    exercises the min-over-rows estimate, not just exact counts. The
    Spark side sketches TWO shards and merges them (counters are
    additive → merged ≡ single-pass, which is what the oracle runs);
    the probe lookup broadcasts the ≤ d*w-row sketch."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    key = F.col("user_id").cast("string")
    s0 = SK.cms_sketch(
        ev.filter(F.col("event_id") % 2 == 0), key, d=_CMS_D, w=_CMS_W
    )
    s1 = SK.cms_sketch(
        ev.filter(F.col("event_id") % 2 == 1), key, d=_CMS_D, w=_CMS_W
    )
    sketch = SK.cms_merge(s0, s1)
    probes = spark.range(10).select(F.col("id").cast("string").alias("key"))
    est = SK.cms_lookup(sketch, probes, "key", d=_CMS_D, w=_CMS_W)
    exact = ev.groupBy(key.alias("key")).agg(
        F.count("*").cast("long").alias("exact_n")
    )
    return est.join(exact, "key", "left").select(
        "key", "est", F.coalesce("exact_n", F.lit(0).cast("long")).alias("exact_n")
    )

"""Correctness-gate queries, dataprep batch 7 (round 3, late):

* `bm25_topk` — inverted-index + BM25 ranked retrieval (operators/
  retrieval.py): the elasticsearch-query-side analog. Rare terms are
  injected into the synthetic corpus (`kw<doc_id%41>`, `xkw<doc_id%7>`)
  so the idf actually discriminates; exact-mode integer scoring makes
  ranks bit-identical across engines.
* `quantile_sketch` — the mergeable HDR-histogram quantile sketch
  (operators/sketch.py): p50/p90/p99 value bounds per event_type, the
  Spark side sketching TWO shards and merging (counters additive →
  merge ≡ single pass, which is what the oracle runs). The exact
  nearest-rank value is computed independently on both engines and the
  gate asserts the sketch brackets it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import cluster as C
from logstash_spark.operators import retrieval as R
from logstash_spark.operators import sketch as SK
from logstash_spark.queries import query

# ---------------------------------------------------------------------------
# BM25 top-k retrieval
# ---------------------------------------------------------------------------

_BM25_QUERIES = [
    (1, ["kw7", "scan"]),
    (2, ["kw40", "xkw3"]),
    (3, ["merge", "window", "kw13"]),
]

_BM25_Q_SQL = " UNION ALL ".join(
    f"SELECT {qid} AS query_id, '{t}' AS term"
    for qid, terms in _BM25_QUERIES
    for t in terms
)

_BM25_DOCS_SQL = """
  SELECT doc_id,
         text || ' kw' || CAST(doc_id % 41 AS VARCHAR)
              || ' xkw' || CAST(doc_id % 7 AS VARCHAR) AS text
  FROM documents
"""


@query(
    "bm25_topk",
    R.bm25_oracle_sql(_BM25_DOCS_SQL, _BM25_Q_SQL, k=10),
)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 per query over the documents corpus decorated with
    deterministic rare terms. Index = ONE explode+groupBy; scoring
    joins only the query terms' postings (query side broadcast); ranks
    are integer-exact (see retrieval.py scoring notes), ties break on
    doc id."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" kw"), (F.col("doc_id") % 41).cast("string"),
            F.lit(" xkw"), (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    postings = R.build_postings(docs)
    queries = spark.createDataFrame(
        [(qid, terms) for qid, terms in _BM25_QUERIES],
        "query_id int, terms array<string>",
    )
    return R.bm25_topk(postings, queries, k=10)


# ---------------------------------------------------------------------------
# Mergeable quantile sketch
# ---------------------------------------------------------------------------

_QS_QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))
_QS_SUB_BITS = 4
_QS_V_SQL = "CAST(floor(value * 100) AS BIGINT)"

_QS_EST = SK.quantile_oracle_sql(
    _QS_V_SQL, "events", quantiles=_QS_QUANTILES,
    groups=["event_type"], sub_bits=_QS_SUB_BITS,
)

_QS_Q_ROWS = " UNION ALL ".join(
    f"SELECT '{label}' AS q_label, CAST({num} AS BIGINT) AS q_num, "
    f"CAST({den} AS BIGINT) AS q_den"
    for label, num, den in _QS_QUANTILES
)


@query(
    "quantile_sketch",
    f"""
    WITH est AS ({_QS_EST}),
    vals AS (
      SELECT event_type, {_QS_V_SQL} AS v FROM events
    ),
    ex AS (
      SELECT event_type, array_agg(v ORDER BY v) AS vs,
             CAST(count(*) AS BIGINT) AS n
      FROM vals GROUP BY 1
    ),
    q AS ({_QS_Q_ROWS}),
    exq AS (
      SELECT event_type, q_label,
             vs[CAST((q_num * n + q_den - 1) // q_den AS INTEGER)] AS exact_v
      FROM ex, q
    )
    SELECT est.event_type, est.q_label, est.est_lb, est.est_ub, est.n,
           CAST(exq.exact_v AS BIGINT) AS exact_v,
           (est.est_lb <= exq.exact_v AND exq.exact_v <= est.est_ub) AS in_bounds
    FROM est JOIN exq USING (event_type, q_label)
    """,
)
def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of floor(value*100) per event_type via the mergeable
    HDR sketch: two event_id-parity shards sketched independently and
    merged (≡ the oracle's single pass), quantile bounds extracted from
    the tiny register table, and the independently computed exact
    nearest-rank value proven to lie inside [est_lb, est_ub]. At
    100 TB each shard ships only its bounded bucket table."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = F.expr(_QS_V_SQL)
    s0 = SK.quantile_sketch(
        ev.filter(F.col("event_id") % 2 == 0), v, ["event_type"],
        sub_bits=_QS_SUB_BITS,
    )
    s1 = SK.quantile_sketch(
        ev.filter(F.col("event_id") % 2 == 1), v, ["event_type"],
        sub_bits=_QS_SUB_BITS,
    )
    est = SK.quantile_estimate(
        SK.quantile_merge(s0, s1), quantiles=_QS_QUANTILES,
        groups=["event_type"], sub_bits=_QS_SUB_BITS,
    )
    qlits = spark.createDataFrame(
        list(_QS_QUANTILES), "q_label string, q_num long, q_den long"
    )
    exact = (
        ev.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(v)).alias("vs"),
            F.count("*").cast("long").alias("n_ex"),
        )
        .crossJoin(F.broadcast(qlits))
        .select(
            "event_type",
            "q_label",
            F.expr(
                "CAST(element_at(vs, CAST((q_num * n_ex + q_den - 1) div q_den"
                " AS INT)) AS BIGINT)"
            ).alias("exact_v"),
        )
    )
    return est.join(exact, ["event_type", "q_label"]).select(
        "event_type", "q_label", "est_lb", "est_ub", "n", "exact_v",
        ((F.col("est_lb") <= F.col("exact_v"))
         & (F.col("exact_v") <= F.col("est_ub"))).alias("in_bounds"),
    )


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (top-k per doc over the inverted index)
# ---------------------------------------------------------------------------


@query(
    "tfidf_topk_terms",
    R.tfidf_oracle_sql(_BM25_DOCS_SQL, k=3),
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per doc by integer-exact TF-IDF over
    the same decorated corpus/index as `bm25_topk` — keyword extraction
    derived entirely from the postings table (no corpus rescan)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" kw"), (F.col("doc_id") % 41).cast("string"),
            F.lit(" xkw"), (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    return R.tfidf_topk_terms(R.build_postings(docs), k=3)


# ---------------------------------------------------------------------------
# Deterministic exact-k reservoir sample per stratum
# ---------------------------------------------------------------------------

_RES_K = 7
_RES_SEED = "res"


@query(
    "reservoir_sample_k",
    f"""
    SELECT doc_id, lang, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                                || ':{_RES_SEED}'), 1, 8) AS BIGINT) ASC,
                        doc_id ASC) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= {_RES_K}
    """,
)
def reservoir_sample_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-{_RES_K}-per-language uniform sample (`dataprep.
    reservoir_sample_k`): hash-ranked without-replacement selection,
    bit-identical across engines and re-runs — the eval-split /
    review-batch primitive that `stratified_sample` (rate-based)
    cannot guarantee an exact count for."""
    from logstash_spark.operators import dataprep as D

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = D.reservoir_sample_k(
        docs, _RES_K, groups=("lang",), key_col="doc_id", seed=_RES_SEED
    )
    return out.select("doc_id", "lang", "sample_rank")


# ---------------------------------------------------------------------------
# Integer-exact Lloyd k-means over the embeddings table
# ---------------------------------------------------------------------------

_KM_K = 4
_KM_DIM = 64
_KM_ITERS = 2


@query(
    "kmeans_lloyd",
    C.kmeans_oracle_sql(
        "SELECT vec_id, embedding FROM embeddings",
        _KM_K, _KM_DIM, iters=_KM_ITERS,
    ),
)
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd rounds of k=4 k-means over the embeddings table
    (operators/cluster.py): centroids literal at assign time (zero
    shuffle), ONE groupBy per update round, integer-exact quantized
    arithmetic so the final (vec_id, cluster, dist) assignment is
    bit-identical to the oracle's unrolled SQL replay. The trainer the
    IVF/SemDeDup family documents as out-of-band."""
    from logstash_spark.operators.cluster import kmeans_lloyd as _km

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return _km(emb, _KM_K, _KM_DIM, iters=_KM_ITERS)

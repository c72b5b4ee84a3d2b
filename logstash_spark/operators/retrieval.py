"""Full-text retrieval: inverted index + BM25 top-k scoring.

Reference parity: Logstash's whole raison d'etre is feeding an
elasticsearch cluster whose query side ranks documents with BM25
(Robertson & Zaragoza 2009, the Lucene default since 5.0). A Spark
re-expression of the pipeline needs the *search* half too — build the
inverted index as a table and answer ranked queries relationally:

    postings:  ONE explode + groupBy(term, doc) — the only corpus-wide
               shuffle, done once at index-build time. Doc length is
               denormalized onto each posting row so scoring never
               joins back to the corpus.
    df table:  groupBy(term) over postings (vocabulary-sized).
    scoring:   query terms (tiny, broadcast) join postings on term —
               the corpus side stays put and only MATCHING postings
               move; one groupBy(query, doc) bounded by those matches;
               top-k per query over the scored handful.

At 100 TB the index build is a single keyed shuffle and the per-query
cost is proportional to the postings of the query's terms — the same
asymptotics as Lucene, expressed as joins.

Scoring arithmetic: classic BM25 needs ln(), which is NOT
bit-reproducible across engines (libm last-ulp differences). Following
this repo's LM-scoring convention, `exact=True` (default, used by the
correctness gate) quantizes the idf to an integer log2 —
idf_q = floor(log2((N - df + 0.5)/(df + 0.5))) computed as
bitlen((2N-2df+1) div (2df+1)) - 1 — and folds k1=6/5, b=3/4 into one
exact integer-scaled rational per term:

    contrib = idf_q * 22 * tf * L * SCALE  div  (10*tf*L + 3*L + 9*dl*N)

(L = total corpus tokens, N = doc count; derive it by clearing
denominators in tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) with
avgdl = L/N). Integer sums are order-independent, so scores and
rankings are bit-identical in any engine. `exact=False` computes the
standard double-precision BM25 with true ln() for production use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: integer scale for exact-mode contributions; keeps idf_q(<=63) * 22 *
#: tf * L * SCALE inside int64 for corpora up to ~10^9 tokens per index
#: shard (larger corpora: lower SCALE or score per-shard and merge).
BM25_SCALE = 10_000

_TOKEN_RE = "[^a-z0-9]+"


def tokenize(col: Column | str) -> Column:
    """Lowercased alphanumeric terms, empty strings dropped — the
    analyzer both engines can replay (`string_split_regex` in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), _TOKEN_RE), lambda x: x != "")


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Inverted index: (term, doc, tf, dl) — ONE explode + ONE groupBy,
    the only corpus-wide shuffle. Doc length is `size(tokens)` computed
    MAP-SIDE before the explode (it equals sum(tf) by construction), so
    it rides into the (term, doc, dl) grouping key for free — no window
    over a different partitioning (which would be a second Exchange) and
    no join back to the corpus at scoring time (plan-shape pinned in
    tests/test_plan_shape.py)."""
    terms = docs.select(
        F.col(id_col).alias("doc"), tokenize(text).alias("_terms")
    )
    toks = terms.select(
        "doc",
        F.size("_terms").cast("long").alias("dl"),
        F.explode("_terms").alias("term"),
    )
    # dl is functionally dependent on doc, so adding it to the grouping
    # key changes nothing about the groups — it just avoids re-deriving
    # doc length after the shuffle.
    return (
        toks.groupBy("term", "doc", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
        .select("term", "doc", "tf", "dl")
    )


def bm25_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    persist: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Index-build entry producing the FULL artifact set scoring wants
    at scale: `(postings, stats, df_table)` — the Lucene
    segment-metadata pattern the per-artifact helpers document.

    The postings are persisted (opt out with `persist=False` if the
    caller manages storage, e.g. writes them to a table) and stats +
    df table derive from that materialization, so the expensive part —
    the corpus scan + tokenize — runs exactly once. Measured on this
    box, tokenization dominates: deriving stats from a SECOND corpus
    pass pre-explode costs ~2× the count-distinct over cached postings
    it would save, so all derivations read the postings. The win over
    passing nothing to `bm25_topk` is amortization — stats/df are
    computed once per index instead of once per query batch, and the
    ad-hoc path's per-batch semi-join df scan disappears."""
    postings = build_postings(docs, id_col=id_col, text=text)
    if persist:
        postings = postings.persist()
    return postings, postings_stats(postings), postings_df_table(postings)


def postings_stats(postings: DataFrame) -> DataFrame:
    """Corpus stats (n_docs, l_tokens) — one global agg with map-side
    partials. At production scale compute this ONCE at index time and
    store it beside the postings (Lucene keeps the same numbers in
    segment metadata); `bm25_topk(stats=...)` then skips the scan."""
    return postings.agg(
        F.countDistinct("doc").cast("long").alias("n_docs"),
        F.sum("tf").cast("long").alias("l_tokens"),
    )


def postings_df_table(postings: DataFrame) -> DataFrame:
    """Per-term document frequency. `build_postings` output is UNIQUE on
    (term, doc) by construction, so df is a plain count — no two-phase
    distinct aggregate. Store with the index for the same reason as
    `postings_stats`; vocabulary-sized output."""
    return postings.groupBy("term").agg(F.count("*").cast("long").alias("df"))


def bm25_topk(
    postings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    exact: bool = True,
    scale: int = BM25_SCALE,
    stats: DataFrame | None = None,
    df_table: DataFrame | None = None,
) -> DataFrame:
    """Rank the top-k docs per query by BM25 (k1=1.2, b=0.75) over a
    `build_postings` index. `queries` = (query_id, terms array<string>)
    or (query_id, term) already exploded; it is assumed SMALL (a query
    workload, not a corpus) and broadcasts. Ties break on ascending
    doc id, so results are total-ordered and reproducible.

    `stats` / `df_table` accept the stored index artifacts
    (`postings_stats` / `postings_df_table`); when absent they are
    derived on the fly, with df restricted to the matched terms FIRST
    (broadcast semi-join before the groupBy) so the ad-hoc path never
    shuffles the full vocabulary."""
    qcols = queries.columns
    if "terms" in qcols:
        qterms = queries.select(
            "query_id", F.explode("terms").alias("term")
        ).distinct()
    else:
        qterms = queries.select("query_id", "term").distinct()

    nl = postings_stats(postings) if stats is None else stats
    if df_table is None:
        dft = postings_df_table(
            postings.join(
                F.broadcast(qterms.select("term").distinct()), "term", "semi"
            )
        )
    else:
        dft = df_table
    # (query, term, idf) — vocabulary-bounded, broadcast into scoring.
    qidf = qterms.join(dft, "term").crossJoin(F.broadcast(nl))
    if exact:
        idf = F.expr(
            "CAST(length(bin(greatest((2*n_docs - 2*df + 1) div (2*df + 1), 1)))"
            " - 1 AS BIGINT)"
        )
    else:
        idf = F.log((2 * F.col("n_docs") - 2 * F.col("df") + 1) / (2 * F.col("df") + 1))
    qidf = qidf.select("query_id", "term", idf.alias("idf"), "n_docs", "l_tokens")

    m = postings.join(F.broadcast(qidf), "term")
    if exact:
        contrib = F.expr(
            f"(idf * 22 * tf * l_tokens * {scale}) div "
            "(10 * tf * l_tokens + 3 * l_tokens + 9 * dl * n_docs)"
        )
        score = F.sum(contrib).cast("long").alias("score_scaled")
    else:
        contrib = (
            F.col("idf")
            * (F.col("tf") * 2.2)
            / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") * F.col("n_docs") / F.col("l_tokens")))
        )
        score = F.sum(contrib).alias("score_scaled")
    scored = m.groupBy("query_id", "doc").agg(score)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_scaled").desc(), F.col("doc").asc()
    )
    return (
        scored.select(
            "query_id", "doc", "score_scaled", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= k)
    )


def bm25_oracle_sql(
    docs_sql: str,
    queries_sql: str,
    k: int = 10,
    scale: int = BM25_SCALE,
    id_col: str = "doc_id",
    text: str = "text",
) -> str:
    """DuckDB rendering of build_postings + bm25_topk(exact=True):
    identical analyzer, identical integer algebra. `queries_sql` must
    yield (query_id, term) rows."""
    return f"""
    WITH tl AS (
      SELECT {id_col} AS doc,
             list_filter(string_split_regex(lower({text}), '{_TOKEN_RE}'),
                         x -> x != '') AS ts
      FROM ({docs_sql})
    ),
    toks AS (
      SELECT doc, CAST(len(ts) AS BIGINT) AS dl, unnest(ts) AS term FROM tl
    ),
    post AS (
      SELECT term, doc, CAST(count(*) AS BIGINT) AS tf, dl
      FROM toks GROUP BY term, doc, dl
    ),
    nl AS (
      SELECT CAST(count(DISTINCT doc) AS BIGINT) AS n_docs,
             CAST(sum(tf) AS BIGINT) AS l_tokens
      FROM post
    ),
    dft AS (
      SELECT term, CAST(count(DISTINCT doc) AS BIGINT) AS df FROM post GROUP BY 1
    ),
    qidf AS (
      SELECT q.query_id, q.term,
             CAST(length(bin(greatest((2*n_docs - 2*df + 1) // (2*df + 1), 1)))
                  - 1 AS BIGINT) AS idf,
             n_docs, l_tokens
      FROM (SELECT DISTINCT query_id, term FROM ({queries_sql})) q
      JOIN dft USING (term) CROSS JOIN nl
    ),
    sc AS (
      SELECT query_id, doc,
             CAST(sum((idf * 22 * tf * l_tokens * {scale}) //
                      (10 * tf * l_tokens + 3 * l_tokens + 9 * dl * n_docs))
                  AS BIGINT) AS score_scaled
      FROM post JOIN qidf USING (term)
      GROUP BY 1, 2
    )
    SELECT query_id, doc, score_scaled, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT query_id, doc, score_scaled,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_scaled DESC, doc ASC) AS rank
      FROM sc
    ) WHERE rank <= {k}
    """


def tfidf_topk_terms(
    postings: DataFrame, k: int = 5
) -> DataFrame:
    """Top-k most characteristic terms per document by integer-exact
    TF-IDF over a `build_postings` index — the keyword-extraction /
    doc-signature step of a curation pipeline (cluster labeling, topic
    balancing, index-time `_boost` fields in the elasticsearch analog).

    score = tf * idf_q with the same quantized idf as `bm25_topk`
    exact mode: idf_q = floor(log2((N - df + 0.5)/(df + 0.5))) via pure
    bigint bit-length — order-independent integer sums, identical in any
    engine. Ties break lexicographically on term, so the top-k set is
    total-ordered and reproducible.

    Shuffle budget: df table = ONE groupBy(term) over postings
    (vocabulary-sized output); scoring joins postings to it on term
    (keyed shuffle bounded by the postings size — at web scale the df
    table is still ~vocabulary rows, so AQE turns this into a broadcast
    whenever the vocabulary fits); top-k = ONE window on doc. No
    corpus-text rescan — everything derives from the index."""
    nl = postings.agg(F.countDistinct("doc").cast("long").alias("n_docs"))
    # postings are unique on (term, doc): df is a plain count, no
    # two-phase distinct aggregate
    dft = postings_df_table(postings)
    idf = F.expr(
        "CAST(length(bin(greatest((2*n_docs - 2*df + 1) div (2*df + 1), 1)))"
        " - 1 AS BIGINT)"
    )
    scored = (
        postings.join(dft, "term")
        .crossJoin(F.broadcast(nl))
        .select(
            "doc",
            "term",
            "tf",
            (F.col("tf") * idf).cast("long").alias("tfidf_scaled"),
        )
    )
    w = Window.partitionBy("doc").orderBy(
        F.col("tfidf_scaled").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= k)
        .where(F.col("tfidf_scaled") > 0)
    )


def tfidf_oracle_sql(
    docs_sql: str, k: int = 5, id_col: str = "doc_id", text: str = "text"
) -> str:
    """DuckDB rendering of build_postings + tfidf_topk_terms."""
    return f"""
    WITH toks AS (
      SELECT {id_col} AS doc,
             unnest(list_filter(string_split_regex(lower({text}), '{_TOKEN_RE}'),
                                x -> x != '')) AS term
      FROM ({docs_sql})
    ),
    post AS (
      SELECT doc, term, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
    ),
    nl AS (SELECT CAST(count(DISTINCT doc) AS BIGINT) AS n_docs FROM post),
    dft AS (
      SELECT term, CAST(count(DISTINCT doc) AS BIGINT) AS df FROM post GROUP BY 1
    ),
    sc AS (
      SELECT doc, term, tf,
             CAST(tf * (length(bin(greatest((2*n_docs - 2*df + 1) // (2*df + 1), 1)))
                        - 1) AS BIGINT) AS tfidf_scaled
      FROM post JOIN dft USING (term) CROSS JOIN nl
    )
    SELECT doc, term, tf, tfidf_scaled, CAST(term_rank AS INTEGER) AS term_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc
                                   ORDER BY tfidf_scaled DESC, term ASC) AS term_rank
      FROM sc
    ) WHERE term_rank <= {k} AND tfidf_scaled > 0
    """

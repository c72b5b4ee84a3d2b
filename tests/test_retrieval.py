"""BM25 retrieval (operators/retrieval.py): postings derivation, exact
integer scoring semantics (idf monotonicity, tf saturation, length
normalization), double-precision mode sanity, and determinism. Cross-
engine value parity is the oracle gate (`bm25_topk`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import retrieval as R


def _corpus(spark):
    rows = [
        (1, "spark shuffle join shuffle shuffle"),
        (2, "spark join"),
        (3, "parquet scan filter pushdown scan"),
        (4, "rare unicorn appears here"),
        (5, "spark spark spark spark spark spark spark spark"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _topk(spark, terms, k=5):
    postings = R.build_postings(_corpus(spark))
    q = spark.createDataFrame([(1, terms)], "query_id int, terms array<string>")
    return R.bm25_topk(postings, q, k=k).collect()


def test_postings_tf_and_dl(spark):
    p = {
        (r["term"], r["doc"]): (r["tf"], r["dl"])
        for r in R.build_postings(_corpus(spark)).collect()
    }
    assert p[("shuffle", 1)] == (3, 5)
    assert p[("spark", 2)] == (1, 2)
    assert p[("spark", 5)] == (8, 8)


def test_rare_term_outranks_common(spark):
    rows = _topk(spark, ["unicorn", "spark"])
    byrank = {r["rank"]: r["doc"] for r in rows}
    # doc 4 holds the only 'unicorn' (df=1 → max idf); 'spark' is in 3/5
    # docs so its idf_q is lower — the unicorn doc must win.
    assert byrank[1] == 4


def test_common_term_idf_floors_to_zero(spark):
    # 'spark' is in 3 of 5 docs: odds ratio (2N-2df+1)/(2df+1) = 5/7 < 2,
    # so the floor-log2 idf quantizes to 0 and contributes nothing —
    # the documented coarseness of exact mode at tiny corpora.
    rows = _topk(spark, ["spark"])
    assert all(r["score_scaled"] == 0 for r in rows)
    # ranking still total-ordered: ties fall back to doc id
    assert [r["doc"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 5]


def test_tf_saturation_and_length_norm(spark):
    # 20 docs, 'zmix' in exactly two: a short doc (tf=1, dl=3) and a
    # long tf-stuffed doc (tf=8, dl=9). df=2/20 → idf_q > 0.
    rows = [(1, "zmix alpha beta"), (2, "zmix " * 8 + "pad")]
    rows += [(i, "alpha beta gamma delta") for i in range(3, 21)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame([(1, ["zmix"])], "query_id int, terms array<string>")
    got = R.bm25_topk(R.build_postings(docs), q, k=5).collect()
    scores = {r["doc"]: r["score_scaled"] for r in got}
    assert scores[1] > 0 and scores[2] > 0
    # tf saturation + length norm: 8x the tf in a 3x-longer doc is
    # nowhere near 8x the score
    assert scores[2] < 3 * scores[1]


def test_only_matching_docs_returned(spark):
    rows = _topk(spark, ["pushdown"])
    assert [r["doc"] for r in rows] == [3]


def test_tie_breaks_on_doc_id(spark):
    spark_df = spark.createDataFrame(
        [(1, "same words here"), (2, "same words here")],
        "doc_id long, text string",
    )
    postings = R.build_postings(spark_df)
    q = spark.createDataFrame([(1, ["same"])], "query_id int, terms array<string>")
    rows = R.bm25_topk(postings, q, k=2).collect()
    assert [(r["rank"], r["doc"]) for r in sorted(rows, key=lambda r: r["rank"])] == [
        (1, 1),
        (2, 2),
    ]


def test_double_mode_agrees_on_ranking(spark):
    postings = R.build_postings(_corpus(spark))
    q = spark.createDataFrame(
        [(1, ["unicorn", "spark", "scan"])], "query_id int, terms array<string>"
    )
    exact = R.bm25_topk(postings, q, k=5, exact=True).collect()
    dbl = R.bm25_topk(postings, q, k=5, exact=False).collect()
    order_exact = [r["doc"] for r in sorted(exact, key=lambda r: r["rank"])]
    order_dbl = [r["doc"] for r in sorted(dbl, key=lambda r: r["rank"])]
    # doc 3 wins in both modes: 'scan' is df=1 like 'unicorn' but tf=2
    assert order_exact[0] == order_dbl[0] == 3
    assert set(order_exact) == set(order_dbl)


def test_tokenizer_analyzer(spark):
    df = spark.createDataFrame([("A,b!!C-3 ",)], "t string")
    got = df.select(R.tokenize("t").alias("x")).collect()[0]["x"]
    assert got == ["a", "b", "c", "3"]


# ---------------------------------------------------------------------------
# TF-IDF top-k terms
# ---------------------------------------------------------------------------


def test_tfidf_rare_terms_win(spark):
    got = R.tfidf_topk_terms(R.build_postings(_corpus(spark)), k=2).collect()
    by_doc = {}
    for r in sorted(got, key=lambda r: (r["doc"], r["term_rank"])):
        by_doc.setdefault(r["doc"], []).append(r["term"])
    # doc 4's words are all df=1 — top-2 are the lexicographically first
    assert by_doc[4] == ["appears", "here"]
    # doc 1: 'shuffle' (tf=3, df=1) beats 'join' (tf=1, df=2)
    assert by_doc[1][0] == "shuffle"


def test_tfidf_zero_scores_dropped(spark):
    # two identical docs: every term df=2/2 → idf_q=0 → no rows at all
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text")], "doc_id long, text string"
    )
    assert R.tfidf_topk_terms(R.build_postings(docs), k=3).count() == 0


def test_tfidf_rank_bounded_and_total_ordered(spark):
    got = R.tfidf_topk_terms(R.build_postings(_corpus(spark)), k=2).collect()
    for r in got:
        assert 1 <= r["term_rank"] <= 2 and r["tfidf_scaled"] > 0
    # deterministic: second run identical
    again = R.tfidf_topk_terms(R.build_postings(_corpus(spark)), k=2).collect()
    key = lambda r: (r["doc"], r["term_rank"], r["term"], r["tfidf_scaled"])
    assert sorted(map(key, got)) == sorted(map(key, again))


# ---------------------------------------------------------------------------
# reservoir_sample_k
# ---------------------------------------------------------------------------


def test_reservoir_exact_k_per_group(spark):
    from logstash_spark.operators.dataprep import reservoir_sample_k

    rows = [(i, "en" if i % 3 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = reservoir_sample_k(df, 5, groups=("lang",)).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert len(by_lang["en"]) == 5 and len(by_lang["de"]) == 5
    # ranks are 1..k and membership is deterministic across runs
    out2 = reservoir_sample_k(df, 5, groups=("lang",)).collect()
    assert sorted((r["lang"], r["doc_id"], r["sample_rank"]) for r in out) == sorted(
        (r["lang"], r["doc_id"], r["sample_rank"]) for r in out2
    )


def test_reservoir_small_group_returns_all(spark):
    from logstash_spark.operators.dataprep import reservoir_sample_k

    df = spark.createDataFrame([(1, "fr"), (2, "fr")], "doc_id long, lang string")
    out = reservoir_sample_k(df, 10, groups=("lang",)).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]


def test_reservoir_seed_independence(spark):
    from logstash_spark.operators.dataprep import reservoir_sample_k

    rows = [(i, "en") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r["doc_id"] for r in reservoir_sample_k(df, 50, seed="a").collect()}
    b = {r["doc_id"] for r in reservoir_sample_k(df, 50, seed="b").collect()}
    assert len(a) == len(b) == 50
    # independent hash families: overlap should be tiny (expected ~1.25)
    assert len(a & b) < 15


def test_bm25_index_artifacts_match_adhoc(spark):
    # the index-time artifact path (stats map-side pre-explode, df table
    # materialized) must reproduce the ad-hoc derivation bit-for-bit —
    # including an empty doc, which contributes to neither n_docs nor
    # the postings
    docs = _corpus(spark).union(
        spark.createDataFrame([(6, "")], "doc_id long, text string")
    )
    post, stats, dft = R.bm25_index(docs)
    s = stats.collect()[0]
    s2 = R.postings_stats(post).collect()[0]
    assert (s.n_docs, s.l_tokens) == (s2.n_docs, s2.l_tokens) == (5, 24)
    q = spark.createDataFrame(
        [(1, ["spark", "unicorn"])], "query_id int, terms array<string>"
    )
    got = sorted(
        tuple(r)
        for r in R.bm25_topk(post, q, k=5, stats=stats, df_table=dft).collect()
    )
    want = sorted(tuple(r) for r in R.bm25_topk(post, q, k=5).collect())
    assert got == want

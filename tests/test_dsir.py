"""DSIR importance resampling (operators/dsir.py): model fit smoothing,
map-only scoring, integer Bernoulli thinning branches, Gumbel top-k
determinism. Cross-engine value parity is the oracle gate
(`dsir_importance_resample`); these pin the operator semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from logstash_spark.operators import dsir as DS

B = 64


def _corpus(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox", source="hi"),
        Row(doc_id=2, text="the quick brown fox jumps", source="hi"),
        Row(doc_id=3, text="lorem ipsum dolor sit amet", source="lo"),
        Row(doc_id=4, text="zzz yyy xxx", source="lo"),
        Row(doc_id=5, text="", source="lo"),
        Row(doc_id=6, text=None, source="lo"),
    ]
    return spark.createDataFrame(rows)


def test_grams_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame([Row(t="a b  c")])  # double space → empty token
    out = df.select(DS.dsir_grams(F.col("t")).alias("g")).head()["g"]
    assert out == ["a", "b", "c", "a b", "b c"]


def test_fit_is_dense_and_smoothed(spark):
    docs = _corpus(spark)
    model = DS.dsir_fit(
        docs.where("source = 'hi'"), docs, text_col="text", buckets=B
    )
    rows = model.collect()
    assert len(rows) == B  # dense: every bucket present
    by_bucket = {r["bucket"]: r for r in rows}
    assert set(by_bucket) == set(range(B))
    # buckets with zero counts still get a finite smoothed logr2
    empty = [r for r in rows if r["t_cnt"] == 0 and r["r_cnt"] == 0]
    assert empty and all(r["logr2"] is not None for r in empty)


def test_score_zero_shuffle_and_empty_docs(spark):
    docs = _corpus(spark)
    model = DS.dsir_fit(
        docs.where("source = 'hi'"), docs, text_col="text", buckets=B
    )
    scored = DS.dsir_score(docs, model, buckets=B)
    # map-only plan: no Exchange on the corpus side
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r["doc_id"]: r for r in scored.collect()}
    assert got[5]["n_grams"] == 0 and got[5]["logw2"] == 0  # empty text
    assert got[6]["n_grams"] == 0 and got[6]["logw2"] == 0  # null text
    # target-like docs outscore off-distribution docs
    assert got[1]["logw2"] > got[4]["logw2"]


def test_resample_branches(spark):
    scored = spark.createDataFrame(
        [
            Row(doc_id=1, logw2=5),  # above threshold → always kept
            Row(doc_id=2, logw2=-100),  # deficit ≥ 32 → always dropped
            Row(doc_id=3, logw2=-2),  # probabilistic band
        ]
    )
    out = {
        r["doc_id"]: r
        for r in DS.dsir_resample(scored, threshold=0, seed=7).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False
    # probabilistic branch: keep == (u32 < 2^30) exactly
    assert out[3]["keep"] == (out[3]["u32"] < 2**30)


def test_resample_seed_independence(spark):
    scored = spark.createDataFrame(
        [Row(doc_id=i, logw2=-8) for i in range(2000)]
    )
    k1 = DS.dsir_resample(scored, threshold=0, seed=1).where("keep").count()
    k2 = DS.dsir_resample(scored, threshold=0, seed=2).where("keep").count()
    expect = 2000 * 2**-8
    # Bernoulli(2^-8) over 2000 docs: both seeds near the mean, not equal sets
    assert 1 <= k1 <= 30 and 1 <= k2 <= 30
    ids1 = {r["doc_id"] for r in DS.dsir_resample(scored, threshold=0, seed=1).where("keep").collect()}
    ids2 = {r["doc_id"] for r in DS.dsir_resample(scored, threshold=0, seed=2).where("keep").collect()}
    assert ids1 != ids2
    assert abs(k1 - expect) < 5 * math.sqrt(expect) + 3


def test_gumbel_topk_deterministic_and_weighted(spark):
    scored = spark.createDataFrame(
        [Row(doc_id=i, logw2=(20 if i < 10 else -20)) for i in range(1000)]
    )
    a = DS.dsir_gumbel_topk(scored, 10, seed=3).collect()
    b = DS.dsir_gumbel_topk(scored, 10, seed=3).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]  # deterministic
    # weight gap 2^40: the 10 heavy docs dominate the top-10
    assert {r["doc_id"] for r in a} == set(range(10))


def test_keyword_blocklist(spark):
    from logstash_spark.operators.dataprep import keyword_blocklist

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="Merge the batch ERROR drop"),
            Row(doc_id=2, text="nothing to see"),
            Row(doc_id=3, text="errors are not error-free"),  # no whole-word hit
            Row(doc_id=4, text=None),
            Row(doc_id=5, text="line one\nerror after newline\tdrop"),
        ]
    )
    out = {
        r["doc_id"]: (r["n_blocked"], r["blocked"])
        for r in keyword_blocklist(df, ["merge", "drop", "error"]).collect()
    }
    assert out[1] == (3, True)  # case-folded whole words, distinct count
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # substrings don't match (C4 whole-word rule)
    assert out[4] == (0, False)
    assert out[5] == (2, True)  # newline/tab are word boundaries too

    plan_df = keyword_blocklist(df, ["merge"])
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_boilerplate_line_removal(spark):
    from logstash_spark.operators.dataprep import (
        line_doc_freq,
        remove_boilerplate_lines,
    )

    rows = [Row(doc_id=i, text=f"unique {i}\nSUBSCRIBE NOW") for i in range(10)]
    rows.append(Row(doc_id=99, text="SUBSCRIBE NOW\nSUBSCRIBE NOW\nkeep me"))
    rows.append(Row(doc_id=100, text=None))
    df = spark.createDataFrame(rows)
    freq = line_doc_freq(df)
    f = {r["line"]: r["df_count"] for r in freq.collect()}
    assert f["SUBSCRIBE NOW"] == 11  # within-doc duplicate counts ONCE
    assert f["keep me"] == 1

    out = remove_boilerplate_lines(df, freq, threshold=5)
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"]) for r in out.collect()}
    assert got[0] == ("unique 0", 1)
    assert got[99] == ("keep me", 2)  # both copies stripped, order kept
    assert got[100] == ("", 0)  # null text → empty, no crash


def test_boilerplate_pipe_separator_literal(spark):
    # regression: line_sep must be treated as a LITERAL everywhere —
    # '|' is a regex metachar, and split/rejoin must agree
    from logstash_spark.operators.dataprep import (
        line_doc_freq,
        remove_boilerplate_lines,
    )

    rows = [Row(doc_id=i, text=f"a {i}|BOILER|b {i}") for i in range(6)]
    df = spark.createDataFrame(rows)
    freq = line_doc_freq(df, line_sep="|")
    out = remove_boilerplate_lines(df, freq, threshold=5, line_sep="|")
    got = {r["doc_id"]: (r["text_clean"], r["n_removed"]) for r in out.collect()}
    assert got[0] == ("a 0|b 0", 1)  # rejoined with literal '|', not '\\|'

"""Golden tests for batch-32: in-cluster Naive-Bayes train + classify."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D

_TRAIN = [
    (1, "buy gold buy now", "spam"),
    (2, "buy pills now", "spam"),
    (3, "meeting notes attached", "ham"),
    (4, "lunch meeting tomorrow", "ham"),
    (5, "notes from the meeting", "ham"),
]


def _lq(k: int) -> int:
    return math.floor(math.log(k) * 1_000_000)


def _py_score(tokens, label, tc, cs, vocab_size, n_total):
    n_docs, n_toks = cs[label]
    s = _lq(n_docs) - _lq(n_total)
    for t in tokens:
        s += _lq(tc.get((label, t), 0) + 1)
    s -= len(tokens) * _lq(n_toks + vocab_size)
    return s


class TestNaiveBayes:
    def _model(self, spark):
        df = spark.createDataFrame(_TRAIN, "doc_id long, text string, label string")
        return D.nb_train(df)

    def test_train_counts(self, spark):
        tc, cs, v = self._model(spark)
        counts = {(r.label, r.token): r.cnt for r in tc.collect()}
        assert counts[("spam", "buy")] == 3
        assert counts[("ham", "meeting")] == 3
        assert ("ham", "buy") not in counts
        stats = {r.label: (r.n_docs, r.n_tokens) for r in cs.collect()}
        assert stats["spam"] == (2, 7)
        assert stats["ham"] == (3, 10)
        assert v.collect()[0].vocab_size == 11  # distinct tokens across classes

    def test_classify_matches_python_rederivation(self, spark):
        tc, cs, v = self._model(spark)
        test = spark.createDataFrame(
            [(10, "buy gold now"), (11, "meeting notes"), (12, "unseen words only")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r
            for r in D.nb_classify(test, tc, cs, v, ["ham", "spam"]).collect()
        }
        counts = {(r.label, r.token): r.cnt for r in tc.collect()}
        stats = {r.label: (r.n_docs, r.n_tokens) for r in cs.collect()}
        vs = v.collect()[0].vocab_size
        for doc_id, text in [(10, "buy gold now"), (11, "meeting notes"), (12, "unseen words only")]:
            toks = text.split()
            for lbl in ("ham", "spam"):
                exp = _py_score(toks, lbl, counts, stats, vs, 5)
                assert got[doc_id][f"nb_score_{lbl}_q"] == exp, (doc_id, lbl)
        assert got[10].nb_label == "spam"
        assert got[11].nb_label == "ham"
        # all-unseen doc: every token term is L(1)=0 for both classes, so
        # the decision reduces to prior + length penalty; ham has both the
        # larger prior and (here) the larger denominator — verify against
        # the exact scores rather than intuition.
        r12 = got[12]
        exp_label = "ham" if r12.nb_score_ham_q >= r12.nb_score_spam_q else "spam"
        assert r12.nb_label == exp_label

    def test_tie_breaks_to_smallest_label(self, spark):
        # perfectly symmetric corpus -> identical scores for both labels
        df = spark.createDataFrame(
            [(1, "x y", "a"), (2, "x y", "b")],
            "doc_id long, text string, label string",
        )
        tc, cs, v = D.nb_train(df)
        test = spark.createDataFrame([(9, "x")], "doc_id long, text string")
        r = D.nb_classify(test, tc, cs, v, ["b", "a"]).collect()[0]
        assert r.nb_score_a_q == r.nb_score_b_q
        assert r.nb_label == "a"

    def test_empty_text_scores_prior_only(self, spark):
        tc, cs, v = self._model(spark)
        test = spark.createDataFrame([(7, "")], "doc_id long, text string")
        r = D.nb_classify(test, tc, cs, v, ["ham", "spam"]).collect()[0]
        assert r.n_tok == 0
        # prior-only: L(n_docs) - L(N)
        assert r.nb_score_ham_q == _lq(3) - _lq(5)
        assert r.nb_score_spam_q == _lq(2) - _lq(5)
        assert r.nb_label == "ham"

    def test_classify_plan_has_single_corpus_shuffle(self, spark):
        tc, cs, v = self._model(spark)
        test = spark.createDataFrame(
            [(i, "buy gold") for i in range(50)], "doc_id long, text string"
        )
        plan = D.nb_classify(test, tc, cs, v, ["ham", "spam"])._jdf.queryExecution().executedPlan().toString()
        # the model join must be broadcast, not a shuffle join
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

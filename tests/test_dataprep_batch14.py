"""Golden tests for batch-14 operators: clean_text (Unicode corpus
normalizer), kwise_pairs (K-wise -> pairwise preference expansion),
dedup_paragraphs_global (CCNet corpus-wide keep-first paragraph dedup).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D
from logstash_spark.operators import webtext as W


def _clean_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(W.clean_text("t").alias("c")).collect()[0]["c"]


class TestCleanText:
    def test_smart_punctuation_folds(self, spark):
        assert (
            _clean_one(spark, "‘a’ “b” – c…")
            == "'a' \"b\" - c..."
        )

    def test_guillemets_and_dash_family(self, spark):
        got = _clean_one(
            spark, "«g» ‹s› ‐‒—−"
        )
        assert got == '"g" \'s\' ----'

    def test_zero_width_and_controls_dropped(self, spark):
        s = "a​b‌c‍d⁠e﻿f­g\x01h\x7fi"
        assert _clean_one(spark, s) == "abcdefghi"

    def test_line_separators_become_newlines(self, spark):
        s = "a\r\nb\rc d e\x0bf\x0cg\x85h"
        assert _clean_one(spark, s) == "a\nb\nc\nd\ne\nf\ng\nh"

    def test_unicode_spaces_fold_and_collapse(self, spark):
        s = "a b c　d  e"
        assert _clean_one(spark, s) == "a b c d e"

    def test_whitespace_discipline(self, spark):
        s = "  x   y\t\tz \n  \n \n\n  w  "
        assert _clean_one(spark, s) == "x y z\n\nw"

    def test_tab_kept_without_collapse(self, spark):
        df = spark.createDataFrame([("a\tb  c",)], "t string")
        got = df.select(
            W.clean_text("t", collapse=False).alias("c")
        ).collect()[0]["c"]
        assert got == "a\tb  c"

    def test_sql_replay_bit_exact(self, spark):
        samples = [
            "mixed ‘q’ –…\r\n​ end",
            "\x02\x1f\x7f⁠﻿",
            "  runs\t\tand\n\n\n\nbreaks  ",
            "",
            "plain ascii stays",
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(samples)], "i long, t string"
        )
        got = {
            r["i"]: r["c"]
            for r in df.select("i", W.clean_text("t").alias("c")).collect()
        }
        con = duckdb.connect()
        sql = W.clean_text_sql("t")
        for i, s in enumerate(samples):
            o = con.execute(
                f"SELECT {sql} FROM (SELECT ?::VARCHAR AS t)", [s]
            ).fetchone()[0]
            assert o == got[i], (i, got[i], o)


class TestKwisePairs:
    def _df(self, spark):
        rows = [
            (1, 11, 9), (1, 12, 7), (1, 13, 7), (1, 14, 3),
            (2, 21, 5),
            (3, 31, 4), (3, 32, 4),
        ]
        return spark.createDataFrame(
            rows, "prompt_id long, doc_id long, score long"
        )

    def test_all_pairs_best_first(self, spark):
        out = (
            D.kwise_pairs(self._df(spark), min_margin=1)
            .orderBy("prompt_id", "pair_rank")
            .collect()
        )
        # sorted desc by (score, id): (9,11),(7,13),(7,12),(3,14)
        assert [(r.chosen_id, r.rejected_id) for r in out] == [
            (11, 13), (11, 12), (11, 14), (13, 14), (12, 14)
        ]
        assert [r.margin for r in out] == [2, 2, 6, 4, 4]
        assert [r.pair_rank for r in out] == [1, 2, 3, 4, 5]
        assert all(r.n_candidates == 4 for r in out)

    def test_tie_groups_and_singletons_yield_nothing(self, spark):
        out = D.kwise_pairs(self._df(spark), min_margin=1).collect()
        assert {r.prompt_id for r in out} == {1}

    def test_zero_margin_includes_ties(self, spark):
        out = D.kwise_pairs(self._df(spark), min_margin=0).collect()
        tie = [r for r in out if r.prompt_id == 3]
        assert len(tie) == 1
        # ids tie-break DESC: 32 is chosen, 31 rejected
        assert (tie[0].chosen_id, tie[0].rejected_id) == (32, 31)

    def test_cap_keeps_best(self, spark):
        out = (
            D.kwise_pairs(self._df(spark), min_margin=1, max_pairs_per_group=2)
            .orderBy("pair_rank")
            .collect()
        )
        assert [(r.chosen_id, r.rejected_id) for r in out] == [
            (11, 13), (11, 12)
        ]

    def test_null_scores_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 11, 9), (1, 12, None), (1, 13, 1)],
            "prompt_id long, doc_id long, score long",
        )
        out = D.kwise_pairs(df, min_margin=1).collect()
        assert [(r.chosen_id, r.rejected_id) for r in out] == [(11, 13)]
        assert out[0].n_candidates == 2


class TestDedupParagraphsGlobal:
    def test_keep_first_across_and_within_docs(self, spark):
        docs = [
            (1, "alpha beta\n\nshared para\n\nunique one"),
            (2, "shared para\n\ngamma delta"),
            (3, "shared para\n\nalpha beta\n\nok"),
            (4, "twin\n\ntwin"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        res = {r.doc_id: r for r in D.dedup_paragraphs_global(df).collect()}
        assert res[1].text == "alpha beta\n\nshared para\n\nunique one"
        assert res[2].text == "gamma delta"
        assert res[3].text == "ok"
        assert res[4].text == "twin"  # intra-doc repeat also collapses
        assert (res[3].n_paras, res[3].n_kept) == (3, 1)
        assert (res[1].n_paras, res[1].n_kept) == (3, 3)

    def test_min_len_short_paragraphs_always_kept(self, spark):
        docs = [(1, "aa\n\nlong paragraph here"), (2, "aa\n\nlong paragraph here")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        res = {
            r.doc_id: r.text
            for r in D.dedup_paragraphs_global(df, min_len=5).collect()
        }
        assert res[1] == "aa\n\nlong paragraph here"
        assert res[2] == "aa"

    def test_custom_separator(self, spark):
        docs = [(1, "x|y"), (2, "y|z")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        res = {
            r.doc_id: r.text
            for r in D.dedup_paragraphs_global(df, sep="|").collect()
        }
        assert res == {1: "x|y", 2: "z"}

    def test_plan_two_exchanges(self, spark):
        docs = spark.createDataFrame(
            [(1, "a\n\nb")], "doc_id long, text string"
        )
        plan = D.dedup_paragraphs_global(docs)._jdf.queryExecution().executedPlan().toString()
        # groupBy(hash) + groupBy(doc) + the joins reuse those keys;
        # totals groupBy shares the doc-key exchange. Allow AQE reuse
        # nodes but no more than 4 real Exchanges.
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= 4, plan

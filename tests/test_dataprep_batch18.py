"""Golden tests for batch-18 operators: readability_features (integer
Flesch-Kincaid), taxonomy_tags (keyword-taxonomy census)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _read(spark, s: str):
    df = spark.createDataFrame([(s,)], "t string")
    feats = D.readability_features(F.col("t"))
    return df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]


class TestReadability:
    def test_hand_computed(self, spark):
        # "The cat sat. The dog ran." -> 6 words, 2 sentences,
        # syllables (vowel groups): e,a,a,e,o,a = 6
        r = _read(spark, "The cat sat. The dog ran.")
        assert (r.n_words, r.n_sentences, r.n_syllables) == (6, 2, 6)
        # fk_cb = (39*6) div 2 + (1180*6) div 6 - 1559 = 117+1180-1559
        assert r.fk_grade_cb == -262
        assert r.digit_ratio_bp == 0

    def test_digit_ratio(self, spark):
        r = _read(spark, "a1b2c3d4e5")  # 5 digits / 10 chars
        assert r.digit_ratio_bp == 5000

    def test_single_sentence_floor(self, spark):
        r = _read(spark, "word")
        assert r.n_sentences == 1
        assert r.n_words == 1

    def test_empty_and_null_safe(self, spark):
        df = spark.createDataFrame([(None,)], "t string")
        feats = D.readability_features(F.col("t"))
        r = df.select(*[v.alias(k) for k, v in feats.items()]).collect()[0]
        assert r.n_syllables == 0 and r.digit_ratio_bp == 0

    def test_complex_text_scores_higher(self, spark):
        simple = _read(spark, "The cat sat. The dog ran. I go. We do.")
        complex_ = _read(
            spark,
            "Extraordinarily convoluted administrative bureaucracies "
            "institutionalize organizational inefficiencies.",
        )
        assert complex_.fk_grade_cb > simple.fk_grade_cb


class TestTaxonomyTags:
    _TAX = {"animals": ["cat", "dog"], "food": ["pizza", "cake", "pie"]}

    def _run(self, spark, text):
        df = spark.createDataFrame([(text,)], "text string")
        return D.taxonomy_tags(df, self._TAX).collect()[0]

    def test_counts_and_dominant(self, spark):
        r = self._run(spark, "Cat dog pizza cat")
        # distinct case-folded hits: animals {cat,dog}=2, food {pizza}=1
        assert (r.tax_animals, r.tax_food) == (2, 1)
        assert r.tax_dominant == "animals"
        assert r.tax_total == 3

    def test_tie_breaks_name_asc(self, spark):
        r = self._run(spark, "dog pie")
        assert (r.tax_animals, r.tax_food) == (1, 1)
        assert r.tax_dominant == "animals"

    def test_no_match_empty_dominant(self, spark):
        r = self._run(spark, "nothing relevant here")
        assert r.tax_dominant == ""
        assert r.tax_total == 0

    def test_empty_taxonomy_raises(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError):
            D.taxonomy_tags(df, {})

"""Golden tests for batch-20 operators: url_lang_variants/url_lang_pairs
(bitext seed pairing) and recency_weighted_sample (time-decay keep)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


class TestUrlLangVariants:
    def _v(self, spark, url: str):
        df = spark.createDataFrame([(url,)], "u string")
        feats = D.url_lang_variants(F.col("u"))
        r = df.select(
            feats["lang"].alias("l"), feats["canon"].alias("c")
        ).collect()[0]
        return r["l"], r["c"]

    def test_basic_lang_segment(self, spark):
        assert self._v(spark, "https://x.com/en/docs/a") == (
            "en", "https://x.com/docs/a"
        )

    def test_region_variant(self, spark):
        assert self._v(spark, "https://x.com/pt-br/p") == (
            "pt", "https://x.com/p"
        )

    def test_lang_only_no_path(self, spark):
        assert self._v(spark, "http://x.com/fr") == ("fr", "http://x.com")

    def test_no_lang_passthrough(self, spark):
        assert self._v(spark, "https://x.com/docs/en-page") == (
            "", "https://x.com/docs/en-page"
        )

    def test_three_letter_segment_not_lang(self, spark):
        assert self._v(spark, "https://x.com/eng/docs")[0] == ""


class TestUrlLangPairs:
    def test_pairs_same_canon_distinct_langs(self, spark):
        rows = [
            (1, "https://a.com/en/p1"),
            (2, "https://a.com/fr/p1"),
            (3, "https://a.com/de/p1"),
            (4, "https://a.com/en/p2"),   # different page: no partner
            (5, "https://b.com/en/p1"),   # different site: no partner
            (6, "https://a.com/p1"),      # no lang: excluded
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = D.url_lang_pairs(df).collect()
        pairs = {(r.lang_a, r.doc_a, r.lang_b, r.doc_b) for r in out}
        assert pairs == {
            ("de", 3, "en", 1),
            ("de", 3, "fr", 2),
            ("en", 1, "fr", 2),
        }
        assert all(r.canon == "https://a.com/p1" for r in out)

    def test_same_lang_variants_not_paired(self, spark):
        rows = [(1, "https://a.com/en/p"), (2, "https://a.com/en/p")]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        assert D.url_lang_pairs(df).count() == 0

    def test_max_variants_cap(self, spark):
        rows = [(i, f"https://a.com/{c}/p") for i, c in enumerate(
            ["aa", "bb", "cc", "dd", "ee"]
        )]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        # cap at 2 variants -> only (aa, bb) survives the slice
        out = D.url_lang_pairs(df, max_variants=2).collect()
        assert {(r.lang_a, r.lang_b) for r in out} == {("aa", "bb")}


class TestRecencySample:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        return {
            r.event_id: r
            for r in D.recency_weighted_sample(
                df, reference_ts="2024-02-15 00:00:00", **kw
            ).collect()
        }

    def test_halvings_by_age(self, spark):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 2, 14)),   # age 1d  -> h 0
            (2, dt.datetime(2024, 2, 1)),    # age 14d -> h 2
            (3, dt.datetime(2024, 1, 1)),    # age 45d -> h 6
            (4, dt.datetime(2025, 1, 1)),    # future  -> h 0
        ]
        got = self._run(spark, rows, half_life_days=7)
        assert [got[i]._halvings for i in (1, 2, 3, 4)] == [0, 2, 6, 0]
        # h=0 rows always survive (u < 2^max is certain)
        assert got[1]._keep and got[4]._keep

    def test_deterministic_and_seeded(self, spark):
        import datetime as dt

        rows = [(i, dt.datetime(2024, 1, 1)) for i in range(200)]
        a = self._run(spark, rows, half_life_days=7)
        b = self._run(spark, rows, half_life_days=7)
        assert all(a[i]._keep == b[i]._keep for i in a)
        c = self._run(spark, rows, half_life_days=7, seed="other")
        assert any(a[i]._keep != c[i]._keep for i in a)
        # h=6 -> expect ~200/64 ≈ 3 survivors; loose band
        kept = sum(a[i]._keep for i in a)
        assert 0 < kept < 20

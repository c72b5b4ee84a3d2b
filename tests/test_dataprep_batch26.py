"""Golden tests for batch-26: inject_canaries / detect_canaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


class TestCanaries:
    def _docs(self, spark, n=200):
        return spark.createDataFrame(
            [(i, f"document body {i}") for i in range(n)],
            "doc_id long, text string",
        )

    def test_injection_rate_and_uniqueness(self, spark):
        out = D.inject_canaries(self._docs(spark), rate_ppm=300_000)
        planted = out.where(F.col("canary").isNotNull()).collect()
        assert 30 < len(planted) < 90  # ~30% of 200
        canaries = [r.canary for r in planted]
        assert len(set(canaries)) == len(canaries)  # doc-unique
        for r in planted:
            assert r.text.endswith(" " + r.canary)
            assert r.canary.startswith("CANARY-") and len(r.canary) == 19

    def test_unselected_text_untouched(self, spark):
        out = D.inject_canaries(self._docs(spark), rate_ppm=300_000)
        clean = out.where(F.col("canary").isNull()).collect()
        assert all(r.text == f"document body {r.doc_id}" for r in clean)

    def test_deterministic_and_seed_independent(self, spark):
        a = set(
            r.doc_id
            for r in D.inject_canaries(self._docs(spark), rate_ppm=300_000)
            .where("canary IS NOT NULL")
            .collect()
        )
        b = set(
            r.doc_id
            for r in D.inject_canaries(self._docs(spark), rate_ppm=300_000)
            .where("canary IS NOT NULL")
            .collect()
        )
        assert a == b
        c = set(
            r.doc_id
            for r in D.inject_canaries(
                self._docs(spark), rate_ppm=300_000, seed="other"
            )
            .where("canary IS NOT NULL")
            .collect()
        )
        assert a != c

    def test_detection_roundtrip(self, spark):
        planted = D.inject_canaries(self._docs(spark), rate_ppm=500_000)
        registry = planted.where("canary IS NOT NULL")
        leaked = registry.where("doc_id % 2 = 0").select(
            F.concat(F.lit("gen: "), "canary", F.lit(" twice "), "canary").alias(
                "text"
            )
        )
        got = {r.canary: r for r in D.detect_canaries(leaked, registry).collect()}
        reg_rows = registry.collect()
        assert set(got) == {r.canary for r in reg_rows}
        for r in reg_rows:
            if r.doc_id % 2 == 0:
                assert got[r.canary].n_hits == 2 and got[r.canary].extracted
            else:
                assert got[r.canary].n_hits == 0 and not got[r.canary].extracted

    def test_unregistered_canary_ignored(self, spark):
        registry = D.inject_canaries(self._docs(spark), rate_ppm=500_000).where(
            "canary IS NOT NULL"
        )
        noise = spark.createDataFrame(
            [("mentions CANARY-ffffffffffff only",)], "text string"
        )
        out = D.detect_canaries(noise, registry).where("extracted").count()
        assert out == 0

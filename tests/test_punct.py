"""punct filter goldens (the driver gate covers the template-mining
composition; these pin the skeleton string itself)."""

from __future__ import annotations

from logstash_spark.functions import punct


class TestPunct:
    def test_skeleton_strips_alnum_and_space(self, spark):
        df = spark.createDataFrame(
            [
                (1, "GET /api/v2/users?id=123 200"),
                (2, "ERROR [pool-3-thread-5] timeout after 250ms"),
                (3, "user=42 action=login ok"),
                (4, ""),
            ],
            "id long, message string",
        )
        got = {r["id"]: r["punct"] for r in punct(df, "message").collect()}
        assert got == {1: "///?=", 2: "[---]", 3: "==", 4: ""}

    def test_custom_source_and_target(self, spark):
        df = spark.createDataFrame([(1, "a.b.c!")], "id long, raw string")
        out = punct(df, "raw", target="sig")
        assert out.first()["sig"] == "..!"
        assert "raw" in out.columns  # source untouched

"""Golden tests for batch-24: grouped_split (eval-leakage guard),
including the real connected-components composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


class TestGroupedSplit:
    def test_groups_never_straddle(self, spark):
        rows = [(i, i % 17) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, grp long")
        out = D.grouped_split(df, group_col="grp")
        per_group = (
            out.groupBy("grp")
            .agg(F.countDistinct("split").alias("n"))
            .collect()
        )
        assert all(r.n == 1 for r in per_group)

    def test_fractions_roughly_hold(self, spark):
        rows = [(i, i) for i in range(2000)]  # every row its own group
        df = spark.createDataFrame(rows, "doc_id long, grp long")
        counts = {
            r.split: r.n
            for r in D.grouped_split(df, group_col="grp")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert counts["train"] / 2000 == pytest.approx(0.9, abs=0.05)
        assert counts.get("val", 0) + counts.get("test", 0) == 2000 - counts["train"]

    def test_deterministic_and_seed_independent(self, spark):
        rows = [(i, i % 40) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, grp long")
        a = {r.doc_id: r.split for r in D.grouped_split(df, group_col="grp").collect()}
        b = {r.doc_id: r.split for r in D.grouped_split(df, group_col="grp").collect()}
        assert a == b
        c = {
            r.doc_id: r.split
            for r in D.grouped_split(df, group_col="grp", seed="s2").collect()
        }
        assert any(a[k] != c[k] for k in a)

    def test_bad_fractions_raise(self, spark):
        df = spark.createDataFrame([(1, 1)], "doc_id long, grp long")
        with pytest.raises(ValueError):
            D.grouped_split(
                df, group_col="grp", fractions=(("train", 1),)
            )

    def test_composes_with_connected_components(self, spark):
        # near-dup pairs chain 0-1-2 and 3-4; 5 is a singleton
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4)], "src long, dst long"
        )
        nodes = spark.createDataFrame(
            [(i,) for i in range(6)], "doc_id long"
        )
        comp = D.connected_components(edges, src="src", dst="dst")
        labeled = nodes.join(
            comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
        ).select(
            "doc_id",
            F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster"),
        )
        out = D.grouped_split(labeled, group_col="cluster")
        got = {r.doc_id: r.split for r in out.collect()}
        assert got[0] == got[1] == got[2]
        assert got[3] == got[4]

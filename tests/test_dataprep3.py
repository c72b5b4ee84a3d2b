"""Unit tests for corpus-curation ops: stratified_sample,
quality_classifier, shard_assign (the oracle parity run covers the
gate queries; these pin behavioral properties the oracles can't)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _docs(spark):
    rows = [
        (i, " ".join(["the", "quick", "fox"] * (i % 5 + 1)), lang, f"s{i % 3}")
        for i, lang in enumerate(
            ["en", "en", "en", "en", "de", "de", "fr", "zh"] * 25
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


class TestStratifiedSample:
    def test_rates_roughly_hold_and_deterministic(self, spark):
        docs = _docs(spark)
        out = D.stratified_sample(
            docs, {"en": 0.5, "de": 0.25}, default_rate=0.0, seed="s1"
        )
        got = out.groupBy("lang").count().collect()
        by_lang = {r["lang"]: r["count"] for r in got}
        # en: 100 docs at 50%, de: 50 at 25% — hash sampling, so wide bounds
        assert 30 <= by_lang.get("en", 0) <= 70
        assert 4 <= by_lang.get("de", 0) <= 25
        assert "fr" not in by_lang and "zh" not in by_lang  # rate 0
        # deterministic: identical second run
        again = D.stratified_sample(
            docs, {"en": 0.5, "de": 0.25}, default_rate=0.0, seed="s1"
        )
        assert sorted(r["doc_id"] for r in out.collect()) == sorted(
            r["doc_id"] for r in again.collect()
        )

    def test_independent_seeds_compose(self, spark):
        docs = _docs(spark)
        a = set(
            r["doc_id"]
            for r in D.stratified_sample(docs, {}, default_rate=0.5, seed="a").collect()
        )
        b = set(
            r["doc_id"]
            for r in D.stratified_sample(docs, {}, default_rate=0.5, seed="b").collect()
        )
        # different seeds must not produce the same sample
        assert a != b

    def test_zero_shuffle_plan(self, spark):
        docs = _docs(spark)
        plan = D.stratified_sample(docs, {"en": 0.5})._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestQualityClassifier:
    def test_columns_and_threshold(self, spark):
        docs = _docs(spark)
        out = D.quality_classifier(docs)
        rows = out.select("doc_id", "clf_logit", "clf_keep").collect()
        assert len(rows) == docs.count()
        for r in rows:
            assert r["clf_keep"] == (r["clf_logit"] > 0.0)

    def test_punct_heavy_doc_scores_lower(self, spark):
        df = spark.createDataFrame(
            [
                (0, "the quick brown fox jumps over the lazy dog again and again"),
                (1, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r["clf_logit"] for r in D.quality_classifier(df).collect()}
        assert rows[0] > rows[1]

    def test_zero_shuffle_plan(self, spark):
        docs = _docs(spark)
        plan = D.quality_classifier(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestShardAssign:
    def test_partitioning_is_total_and_stable(self, spark):
        docs = _docs(spark)
        out = D.shard_assign(docs, 8).select("doc_id", "shard", "shard_pos")
        rows = out.collect()
        assert len(rows) == docs.count()
        assert set(r["shard"] for r in rows) <= set(range(8))
        # positions are 1..n_k contiguous within each shard
        by_shard: dict[int, list[int]] = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))
        # stable across runs
        again = {(r["doc_id"], r["shard"], r["shard_pos"]) for r in out.collect()}
        assert again == {(r["doc_id"], r["shard"], r["shard_pos"]) for r in rows}

    def test_no_window_without_position(self, spark):
        docs = _docs(spark)
        out = D.shard_assign(docs, 8, with_position=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Window" not in plan


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [
                (1, "a", "2024-01-01 00:00:05"),
                (2, "a", "2024-01-01 00:00:15"),
                (3, "a", "2024-01-01 00:00:30"),
                (4, "b", "2024-01-01 00:00:10"),
                (5, "c", "2024-01-01 00:00:10"),
            ],
            "event_id long, k string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        right = spark.createDataFrame(
            [
                ("a", "2024-01-01 00:00:00", 100),
                ("a", "2024-01-01 00:00:15", 200),  # equal-ts: inclusive
                ("b", "2024-01-01 00:00:20", 300),  # after the b event
            ],
            "k string, valid_from string, ver long",
        ).withColumn("valid_from", F.col("valid_from").cast("timestamp"))
        return left, right

    def test_backward_semantics(self, spark):
        from logstash_spark.operators.enrich import asof_join

        left, right = self._frames(spark)
        out = asof_join(left, right, ["k"], right_tiebreak="ver")
        got = {r["event_id"]: r["ver"] for r in out.collect()}
        # event 2 at :15 matches the :15 version (inclusive <=)
        assert got == {1: 100, 2: 200, 3: 200, 4: None, 5: None}
        assert out.count() == left.count()

    def test_tolerance_nulls_stale_matches(self, spark):
        from logstash_spark.operators.enrich import asof_join

        left, right = self._frames(spark)
        out = asof_join(
            left, right, ["k"], right_tiebreak="ver",
            tolerance_seconds=10, matched_ts="since",
        )
        got = {r["event_id"]: (r["ver"], r["since"] is not None) for r in out.collect()}
        # event 3 at :30 is 15s past the :15 version -> outside tolerance
        assert got[3] == (None, False)
        assert got[2] == (200, True)

    def test_single_shuffle_plan(self, spark):
        from logstash_spark.operators.enrich import asof_join

        left, right = self._frames(spark)
        plan = (
            asof_join(left, right, ["k"])
            ._jdf.queryExecution().executedPlan().toString()
        )
        # union + one window partitioned on the key: exactly ONE shuffle,
        # and no broadcast-nested-loop range join
        assert plan.count("Exchange hashpartitioning") <= 1
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan

"""Golden tests for batch-31: conversation_paths and bradley_terry."""

from __future__ import annotations

from logstash_spark.operators import dataprep as D

_MSG_SCHEMA = (
    "conv_id long, msg_id long, parent_id long, role string, text string"
)


class TestConversationPaths:
    def test_branching_tree(self, spark):
        rows = [
            (0, 1, None, "prompter", "hi"),
            (0, 2, 1, "assistant", "hello"),
            (0, 3, 2, "prompter", "how"),
            (0, 4, 3, "assistant", "good"),
            (0, 5, 1, "assistant", "yo"),
        ]
        df = spark.createDataFrame(rows, _MSG_SCHEMA)
        got = {r.msg_id: r for r in D.conversation_paths(df, rounds=3).collect()}
        assert got[4].depth == 4
        assert got[4].context == (
            "prompter: hi\nassistant: hello\nprompter: how\nassistant: good"
        )
        assert got[5].depth == 2
        assert got[5].context == "prompter: hi\nassistant: yo"
        assert got[1].depth == 1
        assert not any(r.truncated for r in got.values())

    def test_truncation_flag_when_rounds_too_small(self, spark):
        # chain 1→2→3→4→5: rounds=1 covers depth ≤ 2
        rows = [(0, i, None if i == 1 else i - 1, "u", f"m{i}") for i in range(1, 6)]
        df = spark.createDataFrame(rows, _MSG_SCHEMA)
        got = {r.msg_id: r for r in D.conversation_paths(df, rounds=1).collect()}
        assert not got[1].truncated and got[1].depth == 1
        assert not got[2].truncated and got[2].depth == 2
        assert got[3].truncated and got[3].depth == 2  # prefix missing
        assert got[5].truncated

    def test_deep_chain_covered_by_doubling(self, spark):
        rows = [(0, i, None if i == 1 else i - 1, "u", f"m{i}") for i in range(1, 17)]
        df = spark.createDataFrame(rows, _MSG_SCHEMA)
        got = {r.msg_id: r for r in D.conversation_paths(df, rounds=4).collect()}
        assert got[16].depth == 16
        assert not got[16].truncated
        assert got[16].context.startswith("u: m1\nu: m2")
        assert got[16].context.endswith("u: m16")


class TestBradleyTerry:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "model_a long, model_b long, winner string")
        return {r.model: r for r in D.bradley_terry(df, **kw).collect()}

    def test_three_to_one_fixed_point(self, spark):
        rows = [(0, 1, "a")] * 3 + [(0, 1, "b")]
        got = self._run(spark, rows, iters=3)
        # exact fixed point p0/p1 = 3 reached after one MM round
        assert got[0].rating_ppm == 1_000_000
        assert got[1].rating_ppm == 333_333
        assert got[0].wins2 == 6 and got[1].wins2 == 2
        assert got[0].n_battles == 4

    def test_single_tie_equal_ratings(self, spark):
        got = self._run(spark, [(0, 1, "tie")], iters=3)
        assert got[0].rating_ppm == 1_000_000
        assert got[1].rating_ppm == 1_000_000

    def test_anchor_override(self, spark):
        rows = [(0, 1, "a")] * 3 + [(0, 1, "b")]
        got = self._run(spark, rows, iters=3, anchor=1)
        assert got[1].rating_ppm == 1_000_000
        assert got[0].rating_ppm == 3_000_000

    def test_transitive_ordering(self, spark):
        # 0 beats 1, 1 beats 2 — ratings must order 0 > 1 > 2
        rows = [(0, 1, "a")] * 4 + [(0, 1, "b")] + [(1, 2, "a")] * 4 + [(1, 2, "b")]
        got = self._run(spark, rows, iters=5)
        assert got[0].rating_ppm > got[1].rating_ppm > got[2].rating_ppm

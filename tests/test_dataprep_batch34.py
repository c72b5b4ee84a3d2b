"""Golden tests for batch-34: vocab_drift, dedup_audit, pack_next_fit."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


class TestVocabDrift:
    def test_identical_corpora_zero_drift(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "b c d d")], "doc_id long, text string"
        )
        row = D.vocab_drift(docs, docs).collect()[0]
        assert row.js_micro == 0
        assert row.tv_ppm == 0
        assert row.types_new == 0 and row.types_lost == 0
        assert row.types_common == row.types_a == row.types_b == 4
        assert row.tokens_a == row.tokens_b == 7

    def test_disjoint_corpora_max_divergence(self, spark):
        a = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
        b = spark.createDataFrame([(2, "p q q")], "doc_id long, text string")
        row = D.vocab_drift(a, b).collect()[0]
        # JS of disjoint supports = ln 2 = 693147 micro-nats (floor slack
        # from per-term quantization stays within a few micro-nats)
        assert 693140 <= row.js_micro <= 693147
        assert row.tv_ppm == 1_000_000
        assert row.types_common == 0
        assert row.types_new == 2 and row.types_lost == 2

    def test_type_churn_counts(self, spark):
        a = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        b = spark.createDataFrame([(2, "b c c")], "doc_id long, text string")
        row = D.vocab_drift(a, b).collect()[0]
        assert row.types_a == 2 and row.types_b == 2
        assert row.types_common == 1  # 'b'
        assert row.types_new == 1  # 'c'
        assert row.types_lost == 1  # 'a'


class TestDedupAudit:
    def test_histogram_and_byte_accounting(self, spark):
        rows = [
            (1, "Hello, World!", 13),   # cluster: hello world
            (2, "hello   world", 13),
            (3, "HELLO WORLD??", 13),
            (4, "unique doc", 10),
            (5, "another one", 11),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
        got = {r.cluster_size: r for r in D.dedup_audit(df).collect()}
        assert set(got) == {1, 3}
        assert got[3].n_clusters == 1
        assert got[3].n_docs == 3 and got[3].n_dup_docs == 2
        # survivor = min doc_id (1, 13 chars); dup bytes = 13 + 13
        assert got[3].chars_dup == 26
        assert got[1].n_clusters == 2 and got[1].n_dup_docs == 0
        assert got[1].chars_dup == 0

    def test_precomputed_key_column(self, spark):
        df = spark.createDataFrame(
            [(1, "k1", 5), (2, "k1", 7), (3, "k2", 9)],
            "doc_id long, k string, n_chars long",
        )
        got = {
            r.cluster_size: r
            for r in D.dedup_audit(df, key_col="k").collect()
        }
        assert got[2].chars_dup == 7  # survivor doc 1 keeps 5
        assert got[1].n_docs == 1


class TestPackNextFit:
    def _pack(self, spark, rows, cap, **kw):
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        return D.pack_next_fit(df, capacity=cap, n_shards=1, **kw)

    def test_longest_first_next_fit(self, spark):
        # lengths sorted desc: 9, 6, 5, 3, 2  with cap 10:
        # bin0: 9 -> bin1: 6+3? NO — next-fit is sequential: 9 | 6 | 5+3+2
        rows = [(1, 5), (2, 9), (3, 2), (4, 6), (5, 3)]
        got = {r.doc_id: r.bin for r in self._pack(spark, rows, 10).collect()}
        assert got[2] == 0          # 9
        assert got[4] == 1          # 6 (9+6 > 10)
        assert got[1] == 2          # 5 (6+5 > 10)
        assert got[3] == got[5] == 2  # 5+3+2 = 10 fits exactly

    def test_oversize_doc_gets_own_bin(self, spark):
        rows = [(1, 50), (2, 4), (3, 3)]
        out = self._pack(spark, rows, 10).collect()
        got = {r.doc_id: r.bin for r in out}
        assert got[1] == 0  # oversize alone (load 50 > cap)
        assert got[2] == 1 and got[3] == 1  # 4+3 fits next bin
        loads = {}
        for r in out:
            loads[r.bin] = loads.get(r.bin, 0) + r.n_tok
        assert loads[0] == 50  # negative slack surfaces downstream

    def test_partition_invariance(self, spark):
        rows = [(i, (i * 7) % 13 + 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        one = {
            (r.doc_id): (r.shard, r.bin)
            for r in D.pack_next_fit(
                df, capacity=20, n_shards=8, partitions=1
            ).collect()
        }
        many = {
            (r.doc_id): (r.shard, r.bin)
            for r in D.pack_next_fit(
                df, capacity=20, n_shards=8, partitions=16
            ).collect()
        }
        assert one == many

    def test_never_splits_and_capacity_respected(self, spark):
        rows = [(i, 1 + (i % 9)) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, n_tok long")
        out = D.pack_next_fit(df, capacity=15, n_shards=4).collect()
        assert len(out) == 100  # every doc exactly once
        loads = {}
        for r in out:
            loads[(r.shard, r.bin)] = loads.get((r.shard, r.bin), 0) + r.n_tok
        assert all(v <= 15 for v in loads.values())  # no doc exceeds cap here

    def test_vocab_drift_broadcast_plan(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i % 5} w{(i * 3) % 7}") for i in range(50)],
            "doc_id long, text string",
        )
        plan = D.vocab_drift(
            docs.where(F.col("doc_id") % 2 == 0),
            docs.where(F.col("doc_id") % 3 != 0),
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

"""Unit tests for dataprep batch 2: unigram LM quality, SemDeDup
semantic dedup (incl. the hot-cluster star guard the oracle gate
disables), Bloom decontamination invariants, and PQ encoding."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import dataprep as D


def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestUnigramLM:
    def test_vocab_topk_and_logp(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a a a b b c"), (2, "a b d")],
            "doc_id long, text string",
        )
        v = {r["word"]: (r["cnt"], r["logp2"]) for r in
             D.unigram_vocab_logp(docs, vocab_size=3).collect()}
        # total=10 words; floor(log2(10))=3
        assert v == {"a": (5, 2 - 3), "b": (3, 1 - 3), "c": (1, 0 - 3)}

    def test_vocab_tie_breaks_on_word(self, spark):
        docs = spark.createDataFrame(
            [(1, "z y x w")], "doc_id long, text string"
        )
        top = [r["word"] for r in D.unigram_vocab_logp(docs, vocab_size=2).collect()]
        assert top == ["w", "x"]  # equal counts → lexicographic

    def test_score_oov_floor_and_exact_ints(self, spark):
        docs = spark.createDataFrame(
            [(1, "a a b"), (2, "zzz")], "doc_id long, text string"
        )
        vocab = D.unigram_vocab_logp(docs, vocab_size=2)  # a, b only
        out = {r["doc_id"]: r for r in
               D.unigram_logprob_score(docs, vocab, oov_logp2=-9).collect()}
        # total=4: a cnt=2 → logp2=1-2=-1; b cnt=1 → 0-2=-2
        assert out[1]["logp2_sum"] == -1 + -1 + -2 and out[1]["n_words"] == 3
        assert out[2]["logp2_sum"] == -9  # OOV floor
        assert abs(out[1]["avg_logp2"] - round(-4 / 3, 4)) < 1e-12


class TestSemanticDedup:
    def test_drops_within_cluster_only(self, spark):
        # two well-separated clusters; near-dups only inside cluster 1
        rows = [
            (1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.0, 1.0]),
            (4, [0.01, 0.999]),
        ]
        df = _emb_df(spark, rows)
        cent = _emb_df(spark, [(100, [1.0, 0.0]), (200, [0.0, 1.0])])
        out = D.semantic_dedup(df, cent, threshold=0.95, mode="flag")
        flags = {r["vec_id"]: r["semantic_dup"] for r in out.collect()}
        assert flags == {1: False, 2: True, 3: False, 4: True}

    def test_drop_mode_keeps_original_columns(self, spark):
        df = _emb_df(spark, [(1, [1.0, 0.0]), (2, [1.0, 0.0])])
        cent = _emb_df(spark, [(9, [1.0, 0.0])])
        kept = D.semantic_dedup(df, cent, threshold=0.99, mode="drop")
        assert kept.columns == ["vec_id", "embedding"]
        assert [r["vec_id"] for r in kept.collect()] == [1]

    def test_hot_cluster_star_guard(self, spark):
        # 50 identical vectors in one cluster, max_bucket=10 → star guard:
        # every non-rep row still drops (pairs only against min-id rep)
        rows = [(i, [1.0, 0.0]) for i in range(50)]
        df = _emb_df(spark, rows)
        cent = _emb_df(spark, [(99, [1.0, 0.0])])
        out = D.semantic_dedup(df, cent, threshold=0.99, max_bucket=10, mode="flag")
        flags = {r["vec_id"]: r["semantic_dup"] for r in out.collect()}
        assert flags[0] is False  # the representative survives
        assert all(flags[i] for i in range(1, 50))


class TestBloomDecontam:
    def test_no_false_negatives_vs_exact(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)))
             for i in range(40)],
            "doc_id long, text string",
        )
        bench = docs.where(F.col("doc_id") < 5)
        exact = D.decontaminate(docs, bench, n=5, mode="flag")
        exact_ids = {r["doc_id"] for r in
                     exact.where("contaminated").select("doc_id").collect()}
        words = D.build_gram_bloom(bench, n=5, m_bits=4096, k=3)
        bloom = D.bloom_decontaminate(docs, words, n=5, m_bits=4096, k=3)
        bloom_ids = {r["doc_id"] for r in
                     bloom.where("might_contaminated").select("doc_id").collect()}
        assert exact_ids <= bloom_ids  # Bloom may over-flag, never under

    def test_bitmap_is_fixed_size(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e f g"), (2, "h i j k l m n o p q")],
            "doc_id long, text string",
        )
        words = D.build_gram_bloom(docs, n=5, m_bits=1024, k=3)
        assert len(words) == 1024 // 32
        assert all(0 <= w < (1 << 32) for w in words)

    def test_short_docs_never_flagged(self, spark):
        docs = spark.createDataFrame(
            [(1, "one two three")], "doc_id long, text string"
        )
        words = D.build_gram_bloom(docs, n=5, m_bits=1024, k=3)
        out = D.bloom_decontaminate(docs, words, n=5, m_bits=1024, k=3).collect()
        assert out[0]["might_contaminated"] is False
        assert out[0]["n_bloom_hits"] == 0


class TestPQ:
    def test_encode_shape_and_range(self, spark):
        df = _emb_df(
            spark, [(i, [float((i + d) % 5 - 2) for d in range(8)]) for i in range(6)]
        )
        out = D.pq_encode(df, dim=8, m_sub=2, k_codes=4).collect()
        for r in out:
            assert len(r["codes"]) == 2
            assert all(0 <= c < 4 for c in r["codes"])

    def test_identical_vectors_share_codes(self, spark):
        v = [0.5] * 8
        df = _emb_df(spark, [(1, v), (2, v), (3, [-0.5] * 8)])
        rows = {r["vec_id"]: list(r["codes"]) for r in
                D.pq_encode(df, dim=8, m_sub=2, k_codes=4).collect()}
        assert rows[1] == rows[2]

    def test_ivf_pq_self_search_finds_duplicate(self, spark):
        # vector 11 is an exact copy of 1 — PQ scores must tie them into
        # each other's top-k (codes identical → identical ADC score)
        base = [(i, [float(((i * 3 + d) % 7) - 3) / 2 for d in range(8)])
                for i in range(10)]
        df = _emb_df(spark, base + [(11, base[1][1])])
        cent = _emb_df(spark, base[:3])
        out = D.ann_ivf_pq(df, df, cent, dim=8, m_sub=2, k_codes=8, k=3, nprobe=2)
        top = {(r["q_id"], r["c_id"]) for r in out.collect() if r["rank"] == 1}
        assert (1, 11) in top or (11, 1) in top


class TestThrottleBeforeAfter:
    def test_two_bound_tagging(self, spark):
        from logstash_spark.operators.aggregate import throttle

        rows = [(i, "k", f"2024-01-01 00:00:{i:02d}") for i in range(1, 6)]
        df = spark.createDataFrame(rows, "event_id long, k string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = throttle(
            df, "k", "ts", period_seconds=3600, before_count=2, after_count=3,
            tag="t", tiebreak="event_id",
        )
        tagged = {r["event_id"] for r in out.collect()
                  if "t" in (r["tags"] or [])}
        # seq 1 (< before_count=2) and seqs 4,5 (> after_count=3)
        assert tagged == {1, 4, 5}

    def test_before_disabled_matches_max_count(self, spark):
        from logstash_spark.operators.aggregate import throttle

        rows = [(i, "k", "2024-01-01 00:00:01") for i in range(1, 5)]
        df = spark.createDataFrame(rows, "event_id long, k string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        a = throttle(df, "k", "ts", max_count=2, tag="t", tiebreak="event_id")
        b = throttle(df, "k", "ts", after_count=2, tag="t", tiebreak="event_id")
        ta = sorted(r["event_id"] for r in a.collect() if "t" in (r["tags"] or []))
        tb = sorted(r["event_id"] for r in b.collect() if "t" in (r["tags"] or []))
        assert ta == tb == [3, 4]

    def test_before_only_disables_after_bound(self, spark):
        # reference parity: a before-only config must NOT inherit the
        # max_count=100 after bound
        from logstash_spark.operators.aggregate import throttle

        rows = [(i, "k", "2024-01-01 00:00:01") for i in range(1, 8)]
        df = spark.createDataFrame(rows, "event_id long, k string, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = throttle(df, "k", "ts", max_count=3, before_count=2,
                       tag="t", tiebreak="event_id")
        tagged = sorted(r["event_id"] for r in out.collect()
                        if "t" in (r["tags"] or []))
        assert tagged == [1]  # only the before bound fires

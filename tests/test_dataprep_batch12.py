"""dpo_pairs / hard_negatives / incontext_pack: hand-replayed
expectations on raw values, edge cases, and shuffle counts."""

from __future__ import annotations

from logstash_spark.operators.dataprep import (
    dpo_pairs,
    hard_negatives,
    incontext_pack,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# dpo_pairs
# ---------------------------------------------------------------------------


def _cands(spark):
    # prompt 1: scores 5, 9, 1 → chosen=12 (9), rejected=13 (1), margin 8
    # prompt 2: tie on both ends (7, 7) → chosen = lower id, rejected =
    #           higher id, margin 0
    # prompt 3: single candidate → dropped (no pair)
    return spark.createDataFrame(
        [
            (1, 11, 5, [1, 2]),
            (1, 12, 9, [3]),
            (1, 13, 1, [4, 5]),
            (2, 21, 7, [6]),
            (2, 22, 7, [7]),
            (3, 31, 4, [8]),
        ],
        "prompt_id bigint, doc_id bigint, score int, tokens array<int>",
    )


def test_dpo_best_vs_worst(spark):
    got = {r.prompt_id: r for r in dpo_pairs(_cands(spark)).collect()}
    assert set(got) == {1, 2}  # prompt 3 has no pair
    assert (got[1].chosen_id, got[1].rejected_id) == (12, 13)
    assert got[1].margin == 8
    assert got[1].chosen_tokens == [3]
    assert got[1].rejected_tokens == [4, 5]
    assert got[1].n_candidates == 3
    # tie-break: chosen = lowest id among max score, rejected = highest
    # id among min score — and they differ even when all scores equal
    assert (got[2].chosen_id, got[2].rejected_id) == (21, 22)
    assert got[2].margin == 0


def test_dpo_min_margin_filter(spark):
    got = dpo_pairs(_cands(spark), min_margin=1).collect()
    assert [r.prompt_id for r in got] == [1]  # margin-0 tie pair dropped


def test_dpo_single_shuffle(spark):
    plan = _plan(dpo_pairs(_cands(spark)))
    # two windows + groupBy all share the prompt_id hash partitioning:
    # exactly ONE Exchange in the physical plan
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# hard_negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_values(spark):
    cand = spark.createDataFrame(
        [
            (1, 101, 90), (1, 102, 80), (1, 103, 70), (1, 104, 60),
            (1, 105, 50),
            (2, 201, 40), (2, 202, 30),
        ],
        "query_id bigint, doc_id bigint, score int",
    )
    gold = spark.createDataFrame(
        [(1, 101), (2, 999)], "query_id bigint, doc_id bigint"
    )
    got = hard_negatives(cand, gold, k=3).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.neg_rank)):
        by_q.setdefault(r.query_id, []).append(r.doc_id)
    # gold 101 excluded; next three by score desc
    assert by_q[1] == [102, 103, 104]
    # gold pair for q2 names a doc not in candidates — nothing excluded
    assert by_q[2] == [201, 202]
    ranks = [r.neg_rank for r in got if r.query_id == 1]
    assert sorted(ranks) == [1, 2, 3]


def test_hard_negatives_broadcast_plan(spark):
    cand = spark.createDataFrame(
        [(1, 101, 90)], "query_id bigint, doc_id bigint, score int"
    )
    gold = spark.createDataFrame([(1, 101)], "query_id bigint, doc_id bigint")
    plan = _plan(hard_negatives(cand, gold, k=1, broadcast_gold=True))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


# ---------------------------------------------------------------------------
# incontext_pack
# ---------------------------------------------------------------------------


def test_incontext_layout(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, 3), ("a", 2, 4), ("a", 3, 2),   # stream: 0,3,7
            ("b", 9, 10),                             # lone doc
        ],
        "cluster string, doc_id bigint, n_tok int",
    )
    got = {
        (r.cluster, r.doc_id): r
        for r in incontext_pack(df, seq_len=5).collect()
    }
    a1, a2, a3 = got[("a", 1)], got[("a", 2)], got[("a", 3)]
    assert [a1.pack_order, a2.pack_order, a3.pack_order] == [1, 2, 3]
    assert [a1.offset, a2.offset, a3.offset] == [0, 3, 7]
    assert [a1.window_id, a2.window_id, a3.window_id] == [0, 0, 1]
    # doc 1 fits [0,3); doc 2 spans 3..7 crossing the 5-boundary; doc 3
    # spans 7..9 inside window 1
    assert [a1.straddles, a2.straddles, a3.straddles] == [False, True, False]
    b = got[("b", 9)]
    assert (b.pack_order, b.offset, b.window_id) == (1, 0, 0)
    assert b.straddles  # 10 tokens overflow the 5-token window


def test_incontext_single_shuffle(spark):
    df = spark.createDataFrame(
        [("a", 1, 3)], "cluster string, doc_id bigint, n_tok int"
    )
    plan = _plan(incontext_pack(df, seq_len=5))
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# pack_concat_chunks with_boundaries
# ---------------------------------------------------------------------------


def test_packing_boundaries(spark):
    from logstash_spark.operators.dataprep import pack_concat_chunks

    # one stream: docs of 3, 4, 5 tokens, seq_len=5
    # stream: d1[0..2] d2[3..6] d3[7..11]
    # chunk 0 = d1 (3) + d2's first 2; chunk 1 = d2's last 2 + d3's
    # first 3; chunk 2 = d3's last 2
    df = spark.createDataFrame(
        [
            ("s", 1, [10, 11, 12], 3),
            ("s", 2, [20, 21, 22, 23], 4),
            ("s", 3, [30, 31, 32, 33, 34], 5),
        ],
        "source string, doc_id bigint, tokens array<int>, n_tok int",
    )
    got = {
        r.seq_id: r
        for r in pack_concat_chunks(
            df, group_col="source", seq_len=5, with_boundaries=True
        ).collect()
    }
    c0, c1, c2 = got[0], got[1], got[2]
    assert c0.tokens == [10, 11, 12, 20, 21]
    # both docs start inside chunk 0; positions reset at each doc start
    assert c0.position_ids == [0, 1, 2, 0, 1]
    assert c0.doc_starts == [0, 3]
    assert c0.seg_lens == [3, 2]
    assert c0.n_segments == 2
    # chunk 1: d2 CONTINUES (positions keep counting: 2, 3), d3 starts
    assert c1.tokens == [22, 23, 30, 31, 32]
    assert c1.position_ids == [2, 3, 0, 1, 2]
    assert c1.doc_starts == [2]  # only d3 begins here
    assert c1.n_segments == 2
    # chunk 2: continuation only — no doc starts at all
    assert c2.tokens == [33, 34]
    assert c2.position_ids == [3, 4]
    assert c2.doc_starts == []
    assert c2.n_segments == 1


def test_packing_boundaries_single_shuffle(spark):
    from logstash_spark.operators.dataprep import pack_concat_chunks

    df = spark.createDataFrame(
        [("s", 1, [10, 11], 2)],
        "source string, doc_id bigint, tokens array<int>, n_tok int",
    )
    plan = _plan(
        pack_concat_chunks(df, group_col="source", seq_len=5, with_boundaries=True)
    )
    assert plan.count("Exchange") == 1


# ---------------------------------------------------------------------------
# chat_loss_mask
# ---------------------------------------------------------------------------


def test_chat_loss_mask_values(spark):
    from logstash_spark.operators.dataprep import chat_loss_mask

    df = spark.createDataFrame(
        [
            # two spans, second clips at the end
            (1, [1, 2, 3, 4, 5, 6], [(1, 3), (4, 99)]),
            # overlapping spans union
            (2, [1, 2, 3, 4], [(0, 2), (1, 3)]),
            # empty span list masks everything
            (3, [7, 8], []),
            # null span list masks everything
            (4, [9], None),
        ],
        "doc_id bigint, tokens array<int>, "
        "train_spans array<struct<s:int,e:int>>",
    )
    got = {r.doc_id: r for r in chat_loss_mask(df).collect()}
    assert got[1].labels == [-100, 2, 3, -100, 5, 6]
    assert got[1].n_trainable == 4
    assert got[2].labels == [1, 2, 3, -100]
    assert got[2].n_trainable == 3
    assert got[3].labels == [-100, -100]
    assert got[3].n_trainable == 0
    assert got[4].labels == [-100]
    assert got[4].n_trainable == 0


def test_dpo_null_score_does_not_hijack(spark):
    # a failed reward-model call (null score) must not become the
    # rejected candidate or null the margin — it just doesn't compete
    df = spark.createDataFrame(
        [(1, 11, 5, [1]), (1, 12, 9, [2]), (1, 13, None, [3])],
        "prompt_id bigint, doc_id bigint, score int, tokens array<int>",
    )
    got = dpo_pairs(df).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.chosen_id, r.rejected_id, r.margin) == (12, 11, 4)
    assert r.n_candidates == 2  # the unscored row is out of the pool


def test_chat_loss_mask_counts_positions_not_values(spark):
    from logstash_spark.operators.dataprep import chat_loss_mask

    df = spark.createDataFrame(
        [(1, [-100, 7, -100], [(0, 2)])],
        "doc_id bigint, tokens array<int>, "
        "train_spans array<struct<s:int,e:int>>",
    )
    r = chat_loss_mask(df).collect()[0]
    # position 0 holds value -100 INSIDE the span: still trainable
    assert r.labels == [-100, 7, -100]
    assert r.n_trainable == 2

"""sft_loss_mask / best_of_n / epoch_replicate: hand-replayed
expectations on raw values + plan shapes."""

from __future__ import annotations

import hashlib

from logstash_spark.operators.dataprep import (
    best_of_n,
    epoch_replicate,
    sft_loss_mask,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# sft_loss_mask
# ---------------------------------------------------------------------------


def test_sft_mask_values(spark):
    df = spark.createDataFrame(
        [
            (1, [10, 20, 30, 40], 2),   # mask first 2
            (2, [10, 20], 5),           # prompt overruns — mask all
            (3, [10, 20], 0),           # nothing masked
            (4, [10, 20], None),        # null prompt_len → nothing masked
            (5, [], 3),                 # empty doc
        ],
        "doc_id bigint, tokens array<int>, prompt_len int",
    )
    got = {r.doc_id: r for r in sft_loss_mask(df).collect()}
    assert got[1].labels == [-100, -100, 30, 40]
    assert got[1].n_masked == 2 and got[1].n_trainable == 2
    assert got[2].labels == [-100, -100]
    assert got[2].n_masked == 2 and got[2].n_trainable == 0
    assert got[3].labels == [10, 20] and got[3].n_masked == 0
    assert got[4].labels == [10, 20] and got[4].n_masked == 0
    assert got[5].labels == [] and got[5].n_masked == 0


def test_sft_mask_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3], 1)], "doc_id bigint, tokens array<int>, prompt_len int"
    )
    assert "Exchange" not in _plan(sft_loss_mask(df))


# ---------------------------------------------------------------------------
# best_of_n
# ---------------------------------------------------------------------------


def test_best_of_n_rank_and_keep(spark):
    rows = [(i, i % 4, (i * 31) % 50) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, prompt_id int, score int")
    out = best_of_n(df, group_col="prompt_id", keep_n=2).collect()
    groups = {}
    for i, g, s in rows:
        groups.setdefault(g, []).append((s, i))
    want = {}
    for g, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for r0, (_, i) in enumerate(items):
            want[i] = r0 + 1
    for r in out:
        assert r.candidate_rank == want[r.doc_id]
        assert r.bon_keep == (r.candidate_rank <= 2)
    assert sum(r.bon_keep for r in out) == 8  # 4 groups × 2


def test_best_of_n_low_is_best(spark):
    df = spark.createDataFrame(
        [(1, 0, 9), (2, 0, 1)], "doc_id bigint, prompt_id int, score int"
    )
    got = {
        r.doc_id: r.candidate_rank
        for r in best_of_n(
            df, group_col="prompt_id", best_is_high=False
        ).collect()
    }
    assert got == {2: 1, 1: 2}


# ---------------------------------------------------------------------------
# epoch_replicate
# ---------------------------------------------------------------------------


def test_epoch_replicate_counts(spark):
    rows = [(i, "wiki" if i < 200 else "cc") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = epoch_replicate(
        df, epochs_bp={"wiki": 24500, "cc": 5000}
    ).collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.epoch_idx)
    for i, src in rows:
        bp = 24500 if src == "wiki" else 5000
        copies = bp // 10000 + (_h32(f"{i}:epoch") % 10000 < bp % 10000)
        assert sorted(got.get(i, [])) == list(range(copies)), f"doc {i}"
    # wiki sees every doc ≥2×; cc is a ~50% downsample
    wiki_rows = sum(1 for r in out if r.source == "wiki")
    cc_rows = sum(1 for r in out if r.source == "cc")
    assert wiki_rows >= 400 and 60 <= cc_rows <= 140


def test_epoch_replicate_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "a")], "doc_id bigint, source string"
    )
    assert "Exchange" not in _plan(epoch_replicate(df))

"""span_corrupt / perplexity_buckets / tokenizer_fertility /
temperature_mix: hand-replayed expectations on raw values."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import (
    perplexity_bucket_by_cutoffs,
    perplexity_buckets,
    span_corrupt,
    temperature_mix,
    tokenizer_fertility,
)


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---------------------------------------------------------------------------
# span_corrupt
# ---------------------------------------------------------------------------


def _expected_spans(doc_id, toks, rate=15, L=3, base=32099, seed="spanc",
                    min_len=8, max_spans=100):
    n = len(toks)
    if n < min_len:
        return toks, [], False
    k = max(1, min(n * rate // (100 * L), n // L, max_spans))
    seg = n // k
    inputs, targets = [], []
    for i in range(k):
        off = _h32(f"{doc_id}:{seed}:{i}") % max(seg - L + 1, 1)
        start = i * seg + off  # 0-based
        end = n if i == k - 1 else (i + 1) * seg
        inputs += toks[i * seg:start] + [base - i] + toks[start + L:end]
        targets += [base - i] + toks[start:start + L]
    targets.append(base - k)
    return inputs, targets, True


def test_span_corrupt_exact(spark):
    rows = [(d, [(d * 7 + i * 13) % 50000 for i in range(3 + d % 149)])
            for d in range(0, 300, 7)]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    out = {r.doc_id: r for r in span_corrupt(df).collect()}
    for d, toks in rows:
        want_in, want_tg, corrupted = _expected_spans(d, toks)
        assert out[d].inputs == want_in, f"doc {d} inputs"
        assert out[d].targets == want_tg, f"doc {d} targets"
        assert out[d].corrupted == corrupted
        assert out[d].n_input == len(want_in)
        assert out[d].n_target == len(want_tg)


def test_span_corrupt_invariants(spark):
    rows = [(d, list(range(d, d + 40))) for d in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    for r in span_corrupt(df, rate_pct=30, span_len=4).collect():
        # reconstruction: non-sentinel tokens of inputs+targets = original
        orig = set(range(r.doc_id, r.doc_id + 40))
        got = [t for t in r.inputs if t < 32000] + [
            t for t in r.targets if t < 32000
        ]
        assert sorted(got) == sorted(orig)
        # sentinels in inputs match targets' leading sentinels
        s_in = [t for t in r.inputs if t >= 32000]
        s_tg = [t for t in r.targets if t >= 32000]
        assert s_tg[:-1] == s_in  # same order, final closing sentinel extra
        assert s_tg[-1] == 32099 - len(s_in)


def test_span_corrupt_short_docs_pass_through(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [])], "doc_id bigint, tokens array<int>"
    )
    out = {r.doc_id: r for r in span_corrupt(df).collect()}
    assert out[1].inputs == [1, 2, 3] and out[1].targets == []
    assert not out[1].corrupted
    assert out[2].inputs == [] and not out[2].corrupted


# ---------------------------------------------------------------------------
# perplexity_buckets
# ---------------------------------------------------------------------------


def test_perplexity_terciles_exact(spark):
    rows = [(i, "en" if i % 3 else "fr", (i * 37) % 100) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, score int")
    out = perplexity_buckets(df, score_col="score").collect()
    by_lang = {}
    for i, lang, score in rows:
        by_lang.setdefault(lang, []).append((score, i))
    want = {}
    for lang, items in by_lang.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rank0, (_, i) in enumerate(items):
            want[i] = rank0 * 3 // len(items)
    for r in out:
        assert r.bucket_idx == want[r.doc_id]
        assert r.bucket == ("head", "middle", "tail")[r.bucket_idx]


def test_perplexity_bucket_by_cutoffs_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "en", 90), (2, "en", 50), (3, "en", 10), (4, "de", 5)],
        "doc_id bigint, lang string, score int",
    )
    out = perplexity_bucket_by_cutoffs(
        df, score_col="score", cutoffs={"en": [80, 40]}
    )
    got = {r.doc_id: r.bucket for r in out.collect()}
    assert got == {1: "head", 2: "middle", 3: "tail", 4: "head"}
    assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# tokenizer_fertility
# ---------------------------------------------------------------------------


def test_tokenizer_fertility_values(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world foo", [1, 2, 3]),        # 15 ch, 3 words, 3 tok
            (2, "aaaa", [1, 2, 3, 4, 5, 6, 7, 8]),    # over-tokenized
            (3, "", [1]),
            (4, "ok", []),
        ],
        "doc_id bigint, text string, tokens array<int>",
    )
    got = {r.doc_id: r for r in tokenizer_fertility(df).collect()}
    assert got[1].chars_per_tok_bp == 50000  # 15*10000/3
    assert got[1].toks_per_word_bp == 10000
    assert got[1].fertility_ok
    assert got[2].chars_per_tok_bp == 5000   # 4*10000/8 — fails min 20000
    assert not got[2].fertility_ok
    assert not got[3].fertility_ok           # zero words
    assert not got[4].fertility_ok           # zero tokens


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------


def test_temperature_mix_quota_and_keep(spark):
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mix(df, target_total=300).collect()
    # integer replay: w = floor(sqrt(n)), quota = min(n, 300*w // sum_w)
    w_big, w_small = math.isqrt(900), math.isqrt(100)
    sw = w_big + w_small
    q = {"big": min(900, 300 * w_big // sw), "small": min(100, 300 * w_small // sw)}
    kept = {"big": 0, "small": 0}
    for r in out:
        assert r.src_quota == q[r.source]
        want = _h32(f"{r.doc_id}:tmix") % r.src_count < r.src_quota
        assert r.mix_keep == want
        kept[r.source] += r.mix_keep
    # √-temperature up-weights the small source: its keep RATE must exceed
    # the big source's even though absolute counts differ
    assert kept["small"] / 100 > kept["big"] / 900


# ---------------------------------------------------------------------------
# plan shapes (the scale claims, pinned)
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_span_corrupt_and_fim_zero_shuffle(spark):
    from logstash_spark.operators.dataprep import fim_transform

    df = spark.createDataFrame(
        [(1, list(range(40)))], "doc_id bigint, tokens array<int>"
    )
    assert "Exchange" not in _plan(span_corrupt(df))
    assert "Exchange" not in _plan(fim_transform(df))


def test_temperature_mix_broadcast_no_corpus_shuffle(spark):
    df = spark.createDataFrame(
        [(i, "s" + str(i % 3)) for i in range(100)],
        "doc_id bigint, source string",
    )
    plan = _plan(temperature_mix(df, target_total=10))
    # quotas come back via broadcast — the corpus side must never
    # hash-shuffle for the join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

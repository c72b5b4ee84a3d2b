"""fim_transform: hand-replayed PSM reordering on raw token arrays."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from logstash_spark.operators.dataprep import fim_transform


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _expected(doc_id: int, toks: list[int], rate=100, seed="fim",
              pre=50281, mid=50282, suf=50283):
    n = len(toks)
    sel = _h32(f"{doc_id}:{seed}:sel") % 100 < rate and n >= 4
    if not sel:
        return toks, False
    span = max(n - 1, 1)
    c1 = _h32(f"{doc_id}:{seed}:a") % span + 1
    c2 = _h32(f"{doc_id}:{seed}:b") % span + 1
    lo, hi = min(c1, c2), max(c1, c2)
    return (
        [pre] + toks[:lo] + [suf] + toks[hi:] + [mid] + toks[lo:hi],
        True,
    )


def test_fim_psm_reorder_exact(spark):
    rows = [(d, list(range(d * 10, d * 10 + 4 + d % 7))) for d in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, tokens array<int>")
    out = {r.doc_id: r for r in fim_transform(df, rate_pct=100).collect()}
    for d, toks in rows:
        want, applied = _expected(d, toks)
        assert out[d].tokens == want, f"doc {d}"
        assert out[d].fim_applied == applied
        assert out[d].n_tok == len(want)
        # token multiset is preserved plus exactly the 3 sentinels
        assert sorted(out[d].tokens) == sorted(toks + [50281, 50282, 50283])


def test_fim_short_docs_and_rate_zero(spark):
    df = spark.createDataFrame(
        [(1, [7]), (2, [1, 2, 3]), (3, list(range(10)))],
        "doc_id bigint, tokens array<int>",
    )
    # min_len=4: docs 1 and 2 never transform even at rate 100
    out = {r.doc_id: r for r in fim_transform(df, rate_pct=100).collect()}
    assert out[1].tokens == [7] and not out[1].fim_applied
    assert out[2].tokens == [1, 2, 3] and not out[2].fim_applied
    assert out[3].fim_applied
    # rate 0: identity for everyone
    out0 = fim_transform(df, rate_pct=0).collect()
    assert all(not r.fim_applied for r in out0)


def test_fim_zero_shuffle(spark):
    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.sequence(F.lit(1), F.lit(8)).cast("array<int>").alias("tokens"),
    )
    assert "Exchange" not in plan_of(fim_transform(df))

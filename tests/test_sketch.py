"""HyperLogLog sketch (operators/sketch.py): register derivation, merge
algebra, estimator accuracy in its design regime, and the scaled-integer
overflow guard. Cross-engine value parity is the oracle gate
(`hll_cardinality`); these pin the operator semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from logstash_spark.operators import sketch as SK


def _keys(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_sketch_shape_and_bounds(spark):
    sk = SK.hll_sketch(_keys(spark, 500), "key", p=8)
    rows = sk.collect()
    assert len(rows) <= 256
    assert all(0 <= r["bucket"] < 256 for r in rows)
    # 24-bit remainder → rho in [1, 25]
    assert all(1 <= r["rho"] <= 25 for r in rows)


def test_merge_equals_single_pass(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("key"))
    single = SK.hll_sketch(df, "key", p=8)
    s0 = SK.hll_sketch(df.filter(F.col("key").cast("long") % 2 == 0), "key", p=8)
    s1 = SK.hll_sketch(df.filter(F.col("key").cast("long") % 2 == 1), "key", p=8)
    merged = SK.hll_merge(s0, s1)
    a = {(r["bucket"]): r["rho"] for r in single.collect()}
    b = {(r["bucket"]): r["rho"] for r in merged.collect()}
    assert a == b


def test_merge_is_idempotent(spark):
    sk = SK.hll_sketch(_keys(spark, 300), "key", p=8)
    twice = SK.hll_merge(sk, sk)
    assert {(r["bucket"], r["rho"]) for r in twice.collect()} == {
        (r["bucket"], r["rho"]) for r in sk.collect()
    }


def test_estimate_accuracy_high_card(spark):
    # n >> 2.5m: raw HLL should land within ~3 standard errors
    # (1.04/sqrt(256) ≈ 6.5% per sigma) of the truth.
    n = 20_000
    est = SK.hll_estimate(SK.hll_sketch(_keys(spark, n), "key", p=8), p=8)
    row = est.collect()[0]
    got = row["est_x1e6"] / 1e6
    assert abs(got - n) / n < 0.20
    assert row["v_empty"] == 0


def test_estimate_groups_and_duplicates(spark):
    rows = [Row(g="a", k=str(i % 10)) for i in range(1000)] + [
        Row(g="b", k=str(i)) for i in range(50)
    ]
    df = spark.createDataFrame(rows)
    est = SK.hll_estimate(SK.hll_sketch(df, "k", ["g"], p=8), ["g"], p=8)
    by_g = {r["g"]: r for r in est.collect()}
    # duplicates collapse: group a has only 10 distinct keys
    assert by_g["a"]["v_empty"] >= 256 - 10
    assert by_g["b"]["v_empty"] >= 256 - 50


def test_overflow_guard():
    # p=20: alpha_micro * 2^40 * 2^13 exceeds int64; guard fires before
    # the sketch is touched.
    with pytest.raises(ValueError, match="overflows"):
        SK.hll_estimate(None, p=20)


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cms_never_undercounts(spark):
    rows = [Row(k=str(i % 7)) for i in range(700)]
    df = spark.createDataFrame(rows)
    sk = SK.cms_sketch(df, "k", d=4, w=16)  # narrow → collisions certain
    probes = spark.createDataFrame([Row(key=str(i)) for i in range(7)])
    est = {r["key"]: r["est"] for r in SK.cms_lookup(sk, probes, d=4, w=16).collect()}
    for i in range(7):
        assert est[str(i)] >= 100  # true count per key


def test_cms_exact_when_wide(spark):
    rows = [Row(k="a")] * 5 + [Row(k="b")] * 3
    df = spark.createDataFrame(rows)
    sk = SK.cms_sketch(df, "k", d=4, w=256)
    probes = spark.createDataFrame([Row(key="a"), Row(key="b"), Row(key="zz")])
    est = {r["key"]: r["est"] for r in SK.cms_lookup(sk, probes, d=4, w=256).collect()}
    assert est["a"] == 5 and est["b"] == 3
    assert est["zz"] <= 5  # absent key: bounded by collisions, often 0


def test_cms_merge_is_additive(spark):
    df = spark.range(400).select(F.col("id").cast("string").alias("k"))
    single = SK.cms_sketch(df, "k", d=4, w=64)
    m = SK.cms_merge(
        SK.cms_sketch(df.filter(F.col("k").cast("long") < 200), "k", d=4, w=64),
        SK.cms_sketch(df.filter(F.col("k").cast("long") >= 200), "k", d=4, w=64),
    )
    a = {(r["row"], r["col"]): r["cnt"] for r in single.collect()}
    b = {(r["row"], r["col"]): r["cnt"] for r in m.collect()}
    assert a == b


def test_cms_sketch_bounded_size(spark):
    df = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    sk = SK.cms_sketch(df, "k", d=4, w=32)
    assert sk.count() <= 4 * 32


def test_cms_d_guard(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="hash family"):
        SK.cms_sketch(df, "k", d=99)

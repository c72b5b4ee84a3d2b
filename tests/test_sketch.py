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


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch
# ---------------------------------------------------------------------------


def _vals(spark, values):
    return spark.createDataFrame([(int(v),) for v in values], "v long")


def test_quantile_bucket_unit_exact_small(spark):
    # below 2^(sub_bits+1) every value is its own bucket: estimates exact
    df = _vals(spark, range(32))
    sk = SK.quantile_sketch(df, "v", sub_bits=4)
    est = SK.quantile_estimate(sk, [("p50", 1, 2)], sub_bits=4).collect()[0]
    # rank ceil(0.5*32)=16 → value 15 (0-based values 0..31)
    assert est["est_lb"] == est["est_ub"] == 15


def test_quantile_relative_error_bound(spark):
    import random

    rng = random.Random(7)
    values = [rng.randrange(1, 1_000_000) for _ in range(5000)]
    df = _vals(spark, values)
    sk = SK.quantile_sketch(df, "v", sub_bits=4)
    out = {
        r["q_label"]: r
        for r in SK.quantile_estimate(sk, sub_bits=4).collect()
    }
    sv = sorted(values)
    for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
        r = (num * len(sv) + den - 1) // den
        exact = sv[r - 1]
        row = out[label]
        assert row["est_lb"] <= exact <= row["est_ub"]
        assert row["est_ub"] <= row["est_lb"] * (1 + 2**-4) + 1


def test_quantile_merge_equals_single(spark):
    df = spark.range(3000).select((F.col("id") * 37 % 9973).alias("v"))
    single = SK.quantile_sketch(df, "v", sub_bits=4)
    m = SK.quantile_merge(
        SK.quantile_sketch(df.filter(F.col("v") % 2 == 0), "v", sub_bits=4),
        SK.quantile_sketch(df.filter(F.col("v") % 2 == 1), "v", sub_bits=4),
    )
    a = {r["bucket"]: r["cnt"] for r in single.collect()}
    b = {r["bucket"]: r["cnt"] for r in m.collect()}
    assert a == b


def test_quantile_sketch_bounded_size(spark):
    df = spark.range(100_000).select((F.col("id") % 50_000 + 1).alias("v"))
    sk = SK.quantile_sketch(df, "v", sub_bits=4)
    # ~16 buckets per octave, values < 2^16 → well under 16*17 rows
    assert sk.count() <= 16 * 17


def test_quantile_zero_and_groups(spark):
    df = spark.createDataFrame(
        [("a", 0), ("a", 0), ("a", 100), ("b", 7)], "g string, v long"
    )
    est = SK.quantile_estimate(
        SK.quantile_sketch(df, "v", ["g"], sub_bits=4),
        [("p50", 1, 2)],
        groups=["g"],
        sub_bits=4,
    )
    rows = {r["g"]: r for r in est.collect()}
    assert rows["a"]["est_lb"] == 0 and rows["a"]["n"] == 3
    assert rows["b"]["est_lb"] == rows["b"]["est_ub"] == 7

"""Lloyd k-means (operators/cluster.py): quantization exactness,
separation recovery, tie/empty-cluster rules, determinism. Cross-engine
value parity is the oracle gate (`kmeans_lloyd`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.operators import cluster as C


def _blobs(spark):
    # two tight blobs far apart in 4-d, 20 points each
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 5) * 0.01, 10.0, 10.0, 10.0]))
        rows.append((100 + i, [-10.0, -10.0 - (i % 5) * 0.01, -10.0, -10.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_two_blobs_recovered(spark):
    out = C.kmeans_lloyd(_blobs(spark), 2, 4, iters=3).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert len(by_cluster) == 2
    sides = sorted(by_cluster.values(), key=lambda s: min(s))
    assert sides[0] == set(range(20))
    assert sides[1] == {100 + i for i in range(20)}
    # within a tight blob after convergence, dist is small in quantized
    # units: components differ from the centroid by <= ~50/1000
    assert all(r["dist"] < 4 * 60 * 60 for r in out)


def test_quantize_offset_invariance(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25]), (2, [-0.125, 0.75])],
        "vec_id long, embedding array<float>",
    )
    a = df.select(C.quantize_vec("embedding", 1000, 8192).alias("q")).collect()
    b = df.select(C.quantize_vec("embedding", 1000, 50000).alias("q")).collect()
    # distances are offset-invariant even though the codes differ
    d_a = sum((x - y) ** 2 for x, y in zip(a[0]["q"], a[1]["q"]))
    d_b = sum((x - y) ** 2 for x, y in zip(b[0]["q"], b[1]["q"]))
    assert d_a == d_b
    assert a[0]["q"] == [500 + 8192, -250 + 8192]


def test_empty_cluster_keeps_previous_centroid(spark):
    # 3 identical points, k=2: one centroid gets everything (ties break
    # to the lowest cid), the other stays where it was seeded and the
    # fit still returns exactly one cluster id per row without error
    df = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(3)], "vec_id long, embedding array<float>"
    )
    out = C.kmeans_lloyd(df, 2, 2, iters=2).collect()
    assert len(out) == 3
    assert {r["cluster"] for r in out} == {0}
    assert all(r["dist"] == 0 for r in out)


def test_deterministic_across_runs(spark):
    df = _blobs(spark)
    key = lambda r: (r["vec_id"], r["cluster"], r["dist"])
    a = sorted(map(key, C.kmeans_lloyd(df, 3, 4, iters=2).collect()))
    b = sorted(map(key, C.kmeans_lloyd(df, 3, 4, iters=2).collect()))
    assert a == b


def test_assignment_is_zero_shuffle(spark):
    # the per-iteration assign pass must not schedule an exchange
    q = _blobs(spark).select(
        "vec_id", C.quantize_vec("embedding").alias("qvec")
    )
    plan = C._assign(q, [[0] * 4, [20000] * 4])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_feeds_ann_ivf(spark):
    # the composition loop the IVF docstring promises: train the coarse
    # quantizer with kmeans_fit, hand centroids_df to ann_ivf
    from logstash_spark.operators.dataprep import ann_ivf

    df = _blobs(spark)
    cents = C.centroids_df(spark, C.kmeans_fit(df, 2, 4, iters=3))
    q = spark.createDataFrame(
        [(900, [10.0, 10.0, 10.0, 10.0])], "vec_id long, embedding array<float>"
    )
    got = ann_ivf(df, q, cents, k=3, nprobe=1, exclude_self=False).collect()
    assert len(got) == 3
    # nearest neighbors of the +10 probe are all from the +10 blob
    assert all(r["c_id"] < 100 for r in got)

"""Unit tests for operators/graph.py (integer-exact PageRank)."""

from pyspark.sql import functions as F

from logstash_spark.operators.graph import RANK_SCALE, graph_nodes, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_hub_outranks_leaves(spark):
    # star: everyone links to hub; hub links to one leaf
    e = _edges(
        spark,
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")],
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert ranks["hub"] > ranks["a"] > ranks["b"]  # a gets hub's backlink
    assert ranks["b"] == ranks["c"]  # symmetric leaves tie exactly


def test_self_loops_and_dup_edges_ignored(spark):
    e1 = _edges(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "a")])
    e2 = _edges(spark, [("a", "b"), ("b", "a")])
    r1 = {r["node"]: r["rank"] for r in pagerank(e1, iters=2).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank(e2, iters=2).collect()}
    assert r1 == r2


def test_initial_mass_split_evenly(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    ranks = [r["rank"] for r in pagerank(e, iters=1).collect()]
    # symmetric ring: every node keeps the same rank after any rounds
    assert len(set(ranks)) == 1
    # and it equals base + d * (r0 div 1)
    r0 = RANK_SCALE // 3
    assert ranks[0] == (r0 * 15) // 100 + (85 * r0) // 100


def test_graph_nodes_and_empty(spark):
    e = _edges(spark, [("a", "b")])
    assert {r["node"] for r in graph_nodes(e).collect()} == {"a", "b"}
    empty = _edges(spark, []).filter(F.lit(False))
    assert pagerank(empty, iters=1).count() == 0


def test_checkpoint_variant_same_result(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")])
    plain = {r["node"]: r["rank"] for r in pagerank(e, iters=2).collect()}
    ck = {
        r["node"]: r["rank"]
        for r in pagerank(e, iters=2, checkpoint=True).collect()
    }
    assert plain == ck

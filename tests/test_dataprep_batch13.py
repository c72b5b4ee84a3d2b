"""length_bucket_batches / batch_pad_stats / skew_report unit goldens
(cross-engine value parity is the oracle gate for each)."""

from __future__ import annotations

from logstash_spark.operators.dataprep import (
    batch_pad_stats,
    length_bucket_batches,
    skew_report,
)


def test_length_buckets_and_batch_split(spark):
    # bucket = bit_length(n_tok); zero/negative land in bucket 0
    rows = [(i, n) for i, n in enumerate([1, 2, 3, 4, 7, 8, 0, -5])]
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    got = {
        r.doc_id: (r.bucket, r.batch_id)
        for r in length_bucket_batches(df, batch_size=2, n_shards=1).collect()
    }
    assert got[0][0] == 1          # 1 -> '1'
    assert got[1][0] == got[2][0] == 2   # 2,3 -> '10','11'
    assert got[3][0] == got[4][0] == 3   # 4,7
    assert got[5][0] == 4          # 8
    assert got[6][0] == got[7][0] == 0   # 0 and negative
    # bucket 0 has 2 docs, batch_size=2 -> one batch id 0
    assert got[6][1] == got[7][1] == 0


def test_batch_order_longest_first_and_pad_stats(spark):
    # one bucket (16..31), batch_size=2: order 31,30,29 -> batches
    # [31,30] and [29]; waste of full batch = 2*31-61 = 1
    df = spark.createDataFrame(
        [(1, 29), (2, 31), (3, 30)], "doc_id long, n_tok long"
    )
    b = length_bucket_batches(df, batch_size=2, n_shards=1)
    stats = {
        r.batch_id: (r.n_docs, r.max_tok, r.sum_tok, r.pad_waste)
        for r in batch_pad_stats(b).collect()
    }
    assert stats[0] == (2, 31, 61, 1)
    assert stats[1] == (1, 29, 29, 0)


def test_length_buckets_sharding_is_partition_of_rows(spark):
    df = spark.range(100).selectExpr("id AS doc_id", "id % 17 + 1 AS n_tok")
    b = length_bucket_batches(df, batch_size=4, n_shards=3).collect()
    assert len(b) == 100
    assert {r.lb_shard for r in b} <= {0, 1, 2}
    # determinism: same input -> identical assignment
    b2 = length_bucket_batches(df, batch_size=4, n_shards=3).collect()
    assert sorted(map(tuple, b)) == sorted(map(tuple, b2))


def test_skew_report_ranks_and_ppm(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [(None,)] * 1, "k string"
    )
    got = {r.rank: r for r in skew_report(df, "k", top_k=2).collect()}
    assert got[1].key == "a" and got[1].cnt == 6 and got[1].ppm == 600000
    assert got[2].key == "b" and got[2].ppm == 300000
    assert got[1].total == 10 and got[1].n_keys == 3  # null is a key


def test_skew_report_null_key_surfaces(spark):
    df = spark.createDataFrame([(None,)] * 5 + [("x",)], "k string")
    top = skew_report(df, "k", top_k=1).collect()[0]
    assert top.key == "<null>" and top.cnt == 5

"""Stateful streaming ops: watermark-bounded dedupe and the
applyInPandasWithState token bucket."""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.streaming.pipeline import (
    file_stream_source,
    streaming_dedupe,
    streaming_token_bucket,
)


def _mk_stream_dir(spark, tmp_path, rows, schema):
    df = spark.createDataFrame(rows, schema).withColumn("ts", F.to_timestamp("ts_s"))
    path = str(tmp_path / "in")
    df.write.parquet(path)
    return path, spark.read.parquet(path).schema


def test_streaming_dedupe_first_wins(spark, tmp_path):
    rows = [
        ("k1", "2026-01-01 00:00:00", 1),
        ("k1", "2026-01-01 00:00:30", 2),  # dup within watermark -> dropped
        ("k2", "2026-01-01 00:00:10", 3),
    ]
    path, schema = _mk_stream_dir(spark, tmp_path, rows, ["k", "ts_s", "v"])
    stream = file_stream_source(spark, path, schema)
    out = streaming_dedupe(stream, ["k"], "ts", watermark="5 minutes")
    q = (
        out.writeStream.format("memory").queryName("dd_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(60)
    got = {r.k: r.v for r in spark.sql("SELECT * FROM dd_out").collect()}
    assert set(got) == {"k1", "k2"}


def test_streaming_token_bucket(spark, tmp_path):
    # 5 events 1s apart; capacity 2, refill 0.5/s:
    # t0 allowed (1 left), t1 allowed (refill +0.5 -> 0.5 left... <1 after spend)
    rows = [(f"u1", f"2026-01-01 00:00:0{i}", i) for i in range(5)]
    path, schema = _mk_stream_dir(spark, tmp_path, rows, ["k", "ts_s", "v"])
    stream = file_stream_source(spark, path, schema)
    out = streaming_token_bucket(
        stream.select("k", "ts"), "k", "ts", capacity=2, refill_per_sec=0.5
    )
    q = (
        out.writeStream.format("memory").queryName("tb_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination(60)
    res = sorted(spark.sql("SELECT * FROM tb_out").collect(), key=lambda r: r.ts)
    allowed = [r.allowed for r in res]
    # bucket: start 2.0 -> spend@t0 (1.0) -> +0.5 spend@t1 (0.5) -> +0.5=1.0
    # spend@t2 (0.0) -> +0.5 deny@t3 (0.5) -> +0.5=1.0 spend@t4 (0.0)
    assert allowed == [True, True, True, False, True]


def test_token_bucket_clock_never_moves_backwards():
    """A late event (out-of-order across micro-batches) must not move
    the refill clock backwards — the next in-order event would re-credit
    an interval already credited. Unit-level check of the walk logic."""
    cap, rate = 5.0, 1.0
    tokens, last = 0.0, 100.0  # bucket drained at t=100

    def step(now):
        nonlocal tokens, last
        if last > 0:
            tokens = min(cap, tokens + max(0.0, now - last) * rate)
        last = max(last, now)
        allowed = tokens >= 1.0
        if allowed:
            tokens -= 1.0
        return allowed

    step(50)   # late event: refill 0, clock stays at 100
    assert last == 100.0
    step(101)  # in-order: refills exactly 1s, not 51s
    assert tokens <= cap - 0.0 and tokens < 2.0

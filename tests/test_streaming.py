"""Streaming mode: the batch plan over a file stream, multi-sink fan-out
via foreachBatch, incremental windowed metrics, session windows — and
equality of streaming vs batch results on the same input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.plans.flagship import build_flagship
from logstash_spark.sources.gen import input_sequences
from logstash_spark.streaming.pipeline import (
    file_stream_source,
    run_streaming_fanout,
    streaming_metrics,
    streaming_sessions,
)

N = 2000
SINKS = ["sink_errors", "sink_edge", "sink_service", "sink_rest", "dlq"]


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("landing")
    df = input_sequences(spark, N, partitions=4)
    # two "arriving" file batches
    df.where(F.col("doc_id") < "doc-000000001000").write.parquet(f"{root}/f1")
    df.where(F.col("doc_id") >= "doc-000000001000").write.parquet(f"{root}/f2")
    # flatten into one dir of parquet files
    import glob
    import shutil

    out = tmp_path_factory.mktemp("stream_in")
    i = 0
    for part in sorted(glob.glob(f"{root}/f*/*.parquet")):
        shutil.copy(part, f"{out}/batch{i:03d}.parquet")
        i += 1
    return str(out), df.schema


def test_streaming_fanout_matches_batch(spark, landing, tmp_path):
    path, schema = landing
    stream = file_stream_source(spark, path, schema, max_files_per_trigger=3)
    assert stream.isStreaming

    q = run_streaming_fanout(
        stream,
        build_flagship,
        SINKS,
        str(tmp_path / "sinks"),
        str(tmp_path / "ckpt"),
        drop_before_write=("raw",),
        layout="per-sink",  # this test reads back {root}/{sink} dirs
    )
    q.awaitTermination(120)

    # batch reference on identical input
    batch_routed = build_flagship(spark.read.schema(schema).parquet(path))
    for sink in SINKS:
        expected = batch_routed.where(F.array_contains("routes", sink)).count()
        got = spark.read.parquet(str(tmp_path / "sinks" / sink)).count()
        assert got == expected, f"{sink}: streaming {got} != batch {expected}"

    # token arrays survive byte-identical: anti-join on (doc_id, tokens)
    src = spark.read.schema(schema).parquet(path).select("doc_id", "tokens")
    out = spark.read.parquet(str(tmp_path / "sinks" / "sink_edge")).select(
        "doc_id", "tokens"
    )
    missing = out.join(src, ["doc_id", "tokens"], "left_anti").count()
    assert missing == 0


def test_streaming_fanout_replay_is_exactly_once(spark, landing, tmp_path):
    """A batch replayed after a mid-fan-out crash must overwrite its own
    _batch_id partition, not append duplicates. Simulated by running the
    same input through a FRESH checkpoint (same batch ids re-delivered
    into already-written sinks)."""
    path, schema = landing
    sinks_root = str(tmp_path / "sinks")
    for ckpt in ("ckpt_a", "ckpt_b"):
        stream = file_stream_source(spark, path, schema, max_files_per_trigger=3)
        q = run_streaming_fanout(
            stream,
            build_flagship,
            SINKS,
            sinks_root,
            str(tmp_path / ckpt),
            drop_before_write=("raw",),
            layout="per-sink",  # reads back {root}/{sink} dirs
        )
        q.awaitTermination(120)

    batch_routed = build_flagship(spark.read.schema(schema).parquet(path))
    for sink in SINKS:
        expected = batch_routed.where(F.array_contains("routes", sink)).count()
        got = spark.read.parquet(f"{sinks_root}/{sink}").count()
        assert got == expected, f"{sink}: replay duplicated rows ({got} != {expected})"


def test_streaming_fanout_unified_layout(spark, landing, tmp_path):
    """layout='unified': one explode + one (sink,_batch_id)-partitioned
    write per micro-batch. Same routing semantics as per-sink filtered
    writes (per-sink counts match batch), token arrays byte-identical,
    and a fresh-checkpoint replay overwrites its own partitions instead
    of duplicating (dynamic overwrite exactly-once)."""
    path, schema = landing
    sinks_root = str(tmp_path / "sinks")
    for ckpt in ("ckpt_a", "ckpt_b"):  # second run = crash-replay analog
        stream = file_stream_source(spark, path, schema, max_files_per_trigger=3)
        q = run_streaming_fanout(
            stream,
            build_flagship,
            SINKS,
            sinks_root,
            str(tmp_path / ckpt),
            drop_before_write=("raw",),
            layout="unified",
        )
        q.awaitTermination(120)

    out = spark.read.parquet(sinks_root)
    batch_routed = build_flagship(spark.read.schema(schema).parquet(path))
    for sink in SINKS:
        expected = batch_routed.where(F.array_contains("routes", sink)).count()
        got = out.where(F.col("sink") == sink).count()
        assert got == expected, f"{sink}: unified {got} != batch {expected}"

    src = spark.read.schema(schema).parquet(path).select("doc_id", "tokens")
    edge = out.where(F.col("sink") == "sink_edge").select("doc_id", "tokens")
    assert edge.join(src, ["doc_id", "tokens"], "left_anti").count() == 0


def test_streaming_metrics_incremental(spark, landing, tmp_path):
    path, schema = landing
    stream = file_stream_source(spark, path, schema)
    parsed = stream.withColumn(
        "event_ts",
        F.to_timestamp(F.substring(F.col("raw"), 1, 19), "yyyy-MM-dd'T'HH:mm:ss"),
    ).where(F.col("event_ts").isNotNull())
    m = streaming_metrics(parsed, "event_ts", ["source"], window_duration="5 minutes")
    q = (
        m.writeStream.format("memory")
        .queryName("m_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_m"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start.isoformat(), r.source): r.cnt
        for r in spark.sql("SELECT * FROM m_out").collect()
    }
    # batch oracle
    b = (
        spark.read.schema(schema).parquet(path)
        .withColumn(
            "event_ts",
            F.to_timestamp(F.substring(F.col("raw"), 1, 19), "yyyy-MM-dd'T'HH:mm:ss"),
        )
        .where(F.col("event_ts").isNotNull())
        .groupBy(F.window("event_ts", "5 minutes").alias("w"), "source")
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "source", "cnt")
    )
    expected = {(r.ws.isoformat(), r.source): r.cnt for r in b.collect()}
    assert got == expected


def test_streaming_sessions(spark, landing, tmp_path):
    path, schema = landing
    stream = file_stream_source(spark, path, schema)
    parsed = stream.withColumn(
        "event_ts",
        F.to_timestamp(F.substring(F.col("raw"), 1, 19), "yyyy-MM-dd'T'HH:mm:ss"),
    ).where(F.col("event_ts").isNotNull())
    s = streaming_sessions(parsed, "event_ts", "source", gap="30 seconds")
    q = (
        s.writeStream.format("memory")
        .queryName("s_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM s_out").collect()
    # malformed rows (i % 211 == 0, truncated raw) fail the ts parse and
    # are filtered before sessionization
    n_valid = N - len([i for i in range(N) if i % 211 == 0])
    assert sum(r.n_events for r in rows) == n_valid
    assert {r.source for r in rows} == {"web", "app", "syslog", "db", "crawler", "iot"}


def test_streaming_dict_refresh_between_batches(spark, tmp_path):
    """logstash-filter-translate refresh_interval analog: a changed
    dictionary_path is reloaded and re-broadcast between micro-batches —
    rows in a later batch of the SAME logical stream see the new mapping."""
    import json
    import os

    from logstash_spark.streaming.pipeline import refreshing_translate

    schema = "id long, code string"
    landing = tmp_path / "in"
    dpath = tmp_path / "dict.json"
    dpath.write_text(json.dumps({"a": "v1"}))

    spark.createDataFrame([(1, "a")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(landing))

    t = refreshing_translate("code", "label", str(dpath), fallback="miss")

    def transform(df):
        return t(df).withColumn("routes", F.array(F.lit("all")))

    sinks_root = str(tmp_path / "sinks")
    ckpt = str(tmp_path / "ckpt")
    q = run_streaming_fanout(
        file_stream_source(spark, str(landing), schema), transform, ["all"],
        sinks_root, ckpt, layout="per-sink",
    )
    q.awaitTermination(120)

    dpath.write_text(json.dumps({"a": "v2"}))
    os.utime(dpath, ns=(os.stat(dpath).st_atime_ns, os.stat(dpath).st_mtime_ns + 10**9))
    spark.createDataFrame([(2, "a")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(landing))

    q = run_streaming_fanout(
        file_stream_source(spark, str(landing), schema), transform, ["all"],
        sinks_root, ckpt, layout="per-sink",
    )
    q.awaitTermination(120)

    rows = {
        r["id"]: r["label"]
        for r in spark.read.parquet(f"{sinks_root}/all").collect()
    }
    assert rows == {1: "v1", 2: "v2"}


def test_file_source_text_tail_with_path_field(spark, tmp_path):
    """logstash-input-file over raw log text: fmt='text' reads
    line-per-row, `path_field` carries the source file (the reference's
    `path` event field), and the line content lands in `value` ready for
    the codec/grok chain."""
    landing = tmp_path / "logs"
    landing.mkdir()
    (landing / "a.log").write_text("alpha 1\nalpha 2\n")
    (landing / "b.log").write_text("beta 1\n")
    out = tmp_path / "out"
    stream = file_stream_source(
        spark, str(landing), "value string", fmt="text", path_field="path"
    )
    q = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", str(out))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(str(out)).collect()
    got = {(r["value"], r["path"].rsplit("/", 1)[-1]) for r in rows}
    assert got == {
        ("alpha 1", "a.log"), ("alpha 2", "a.log"), ("beta 1", "b.log")
    }


def test_file_source_completed_action_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="delete.*archive|archive.*delete"):
        file_stream_source(
            spark, str(tmp_path), "value string", fmt="text",
            completed_action="rename",
        )
    with pytest.raises(ValueError, match="archive_dir"):
        file_stream_source(
            spark, str(tmp_path), "value string", fmt="text",
            completed_action="archive",
        )


def test_file_source_read_mode_deletes_completed(spark, tmp_path):
    """`mode => read` + `file_completed_action => delete`: Spark's
    cleanSource removes each file once a LATER batch commits (cleanup of
    batch N happens at batch N+1), so with one file per trigger the
    first file must be gone after the run."""
    import glob as _glob
    import time as _time

    landing = tmp_path / "in"
    landing.mkdir()
    for i in range(3):
        (landing / f"f{i}.log").write_text(f"line {i}\n")
    stream = file_stream_source(
        spark, str(landing), "value string", fmt="text",
        max_files_per_trigger=1, completed_action="delete",
    )
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # cleanup is asynchronous best-effort; poll briefly
    for _ in range(20):
        left = _glob.glob(str(landing / "*.log"))
        if len(left) < 3:
            break
        _time.sleep(0.5)
    assert len(left) < 3, "cleanSource=delete removed no completed file"


class TestStreamingIntervalJoin:
    def test_time_bound_and_key_matching(self, spark, tmp_path):
        from logstash_spark.streaming.pipeline import (
            drain_available_now,
            streaming_interval_join,
        )

        left_rows = [
            (1, "2024-01-01 00:00:00"),
            (2, "2024-01-01 00:00:00"),
        ]
        right_rows = [
            (1, "2024-01-01 00:05:00", 10.0),   # in window
            (1, "2024-01-01 00:20:00", 20.0),   # past 10-minute bound
            (1, "2023-12-31 23:59:00", 30.0),   # before the start
            (3, "2024-01-01 00:01:00", 40.0),   # no matching key
        ]
        ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
        spark.createDataFrame(left_rows, "k long, l_ts string").withColumn(
            "l_ts", F.col("l_ts").cast("timestamp")
        ).write.parquet(ldir)
        spark.createDataFrame(right_rows, "rk long, r_ts string, v double").withColumn(
            "r_ts", F.col("r_ts").cast("timestamp")
        ).write.parquet(rdir)
        lschema = spark.read.parquet(ldir).schema
        rschema = spark.read.parquet(rdir).schema
        lstream = spark.readStream.schema(lschema).parquet(ldir)
        rstream = spark.readStream.schema(rschema).parquet(rdir)
        joined = streaming_interval_join(
            lstream, rstream,
            left_key="k", right_key="rk",
            left_ts="l_ts", right_ts="r_ts",
            within="10 minutes",
            watermark="3650 days",  # bounded replay: no eviction
        )
        got = drain_available_now(joined, output_mode="append").collect()
        assert len(got) == 1
        assert got[0].k == 1 and got[0].v == 10.0

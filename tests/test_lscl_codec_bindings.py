"""Round-5 LSCL codec-binding surface: every wire codec operator that
already had a driver-green gate is now reachable from `.conf` text
(reference: any codec attaches to any plugin, logstash-core
lib/logstash/config/mixin.rb). The netflow path has its own driver gate
(`lscl_binary_codec`); these unit tests pin the rest of the binding
matrix plus the byte-denominated streaming backpressure knob.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from logstash_spark.plans.lscl import (
    LSCLError,
    apply_decode_codec,
    apply_encode_codec,
    bind_input,
    parse_config,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# decode bindings (conf text -> operators)
# ---------------------------------------------------------------------------


def _input_codec(conf_text: str):
    ast = parse_config(conf_text)
    plug = ast.inputs[0]
    return plug.attrs["codec"]


def test_cef_decode_binding(spark, tmp_path):
    line = (
        "CEF:0|Elastic|Logstash|1.0|42|Probe|5|src=10.0.0.1 dst=10.0.0.2"
    )
    p = tmp_path / "cef.log"
    p.write_text(line + "\n" + line + "\n")
    conf = f'input {{ file {{ path => "{p}" codec => cef }} }}'
    df = bind_input(spark, parse_config(conf))
    rows = df.collect()
    assert len(rows) == 2
    r = rows[0].asDict()
    assert r["device_vendor"] == "Elastic" and r["severity"] == "5"
    assert r["cef_ext"]["src"] == "10.0.0.1"


def test_es_bulk_decode_binding(spark, tmp_path):
    p = tmp_path / "bulk.ndjson"
    p.write_text(
        '{"index":{"_index":"logs","_id":"1"}}\n'
        '{"msg":"a","n":1}\n'
        '{"index":{"_index":"logs","_id":"2"}}\n'
        '{"msg":"b","n":2}\n'
    )
    conf = f'input {{ file {{ path => "{p}" codec => es_bulk }} }}'
    df = bind_input(spark, parse_config(conf))
    assert df.count() == 2


def test_avro_decode_binding(spark, tmp_path):
    from logstash_spark.operators.wire import avro_encode

    schema = [("rec_id", "long"), ("name", "string")]
    enc = avro_encode(
        spark.range(5).select(
            F.col("id").alias("rec_id"),
            F.concat(F.lit("n-"), F.col("id").cast("string")).alias("name"),
        ),
        schema,
    ).select("rec_id", "avro_datum").collect()
    d = tmp_path / "datums"
    d.mkdir()
    for r in enc:
        (d / f"{r['rec_id']}.avro").write_bytes(bytes(r["avro_datum"]))
    conf = (
        f'input {{ file {{ path => "{d}" codec => avro {{'
        ' schema => [["rec_id", "long"], ["name", "string"]] } } }'
    )
    df = bind_input(spark, parse_config(conf))
    got = {r["rec_id"]: r["name"] for r in df.collect()}
    assert got == {i: f"n-{i}" for i in range(5)}


def test_protobuf_decode_binding(spark, tmp_path):
    from logstash_spark.operators.wire import protobuf_encode

    schema = [(1, "rec_id", "sint64"), (2, "msg", "string")]
    enc = protobuf_encode(
        spark.range(4).select(
            (F.col("id") - 2).alias("rec_id"),
            F.concat(F.lit("m"), F.col("id").cast("string")).alias("msg"),
        ),
        schema,
        emit_defaults=True,
    ).select("msg", "pb_msg").collect()
    d = tmp_path / "pbs"
    d.mkdir()
    for i, r in enumerate(enc):
        (d / f"{i}.pb").write_bytes(bytes(r["pb_msg"]))
    conf = (
        f'input {{ file {{ path => "{d}" codec => protobuf {{'
        ' fields => [[1, "rec_id", "sint64"], [2, "msg", "string"]] } } }'
    )
    df = bind_input(spark, parse_config(conf))
    got = sorted(r["rec_id"] for r in df.collect())
    assert got == [-2, -1, 0, 1]


def test_fluent_decode_binding(spark, tmp_path):
    from logstash_spark.operators.wire import fluent_encode

    enc = fluent_encode(
        spark.range(3).select(
            "id",
            F.concat(F.lit("msg-"), F.col("id").cast("string")).alias("msg"),
            (F.col("id") * 7).alias("n"),
        ),
        ["msg", "n"],
        tag=F.lit("app.x"),
        time=F.lit(1_700_000_000),
    ).select("id", "fluent_msg").collect()
    d = tmp_path / "fl"
    d.mkdir()
    for r in enc:
        (d / f"{r['id']}.msgpack").write_bytes(bytes(r["fluent_msg"]))
    conf = (
        f'input {{ file {{ path => "{d}" codec => fluent {{'
        ' schema => [["msg", "string"], ["n", "bigint"]] } } }'
    )
    df = bind_input(spark, parse_config(conf))
    got = sorted((r["msg"], r["n"]) for r in df.collect())
    assert got == [("msg-0", 0), ("msg-1", 7), ("msg-2", 14)]


def test_collectd_decode_binding(spark, tmp_path):
    from logstash_spark.operators.wire import collectd_encode_single_derive

    enc = collectd_encode_single_derive(
        spark.range(3),
        host=F.lit("h1"),
        plugin=F.lit("cpu"),
        type_=F.lit("derive"),
        type_instance=F.lit("user"),
        time_s=F.lit(1_700_000_000),
        interval_s=F.lit(60),
        value=F.col("id") * 5,
    ).select("id", "packet").collect()
    d = tmp_path / "cd"
    d.mkdir()
    for r in enc:
        (d / f"{r['id']}.bin").write_bytes(bytes(r["packet"]))
    conf = f'input {{ file {{ path => "{d}" codec => collectd }} }}'
    df = bind_input(spark, parse_config(conf))
    got = sorted(r["value_counter"] for r in df.collect())
    assert got == [0, 5, 10]


def test_unknown_codec_still_raises(spark):
    with pytest.raises(LSCLError, match="no offline binding"):
        apply_decode_codec(
            spark.range(1).select(F.lit("x").alias("value")),
            _input_codec('input { file { path => "/x" codec => edn } }'),
        )


# ---------------------------------------------------------------------------
# encode bindings
# ---------------------------------------------------------------------------


def _enc_df(spark):
    return spark.range(3).select(
        F.concat(F.lit("svc.m"), F.col("id").cast("string")).alias("metric"),
        (F.col("id") * 2).cast("double").alias("value"),
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
        F.col("id").alias("id"),
        F.concat(F.lit("sev"), F.col("id").cast("string")).alias("severity"),
        F.lit("sig").alias("sig_id"),
        F.lit("evt").alias("name"),
    )


def test_graphite_encode_binding(spark):
    out = apply_encode_codec(_enc_df(spark), "graphite", {})
    assert out.columns == ["message"]
    lines = sorted(r["message"] for r in out.collect())
    assert lines[0] == "svc.m0 0 1700000000"


def test_statsd_encode_binding(spark):
    out = apply_encode_codec(
        _enc_df(spark), "statsd", {"namespace": "ns", "metric_type": "g"}
    )
    lines = sorted(r["message"] for r in out.collect())
    assert lines[0] == "ns.svc.m0:0|g"


def test_es_bulk_encode_binding(spark):
    out = apply_encode_codec(
        _enc_df(spark).select("id", "metric", "value"),
        "es_bulk",
        {"index": "logs", "document_id": "id", "source_cols": ["metric"]},
    )
    lines = sorted(r["message"] for r in out.collect())
    assert lines[0].startswith('{"index":{"_index":"logs","_id":"0"}}\n')


def test_cef_encode_binding(spark):
    out = apply_encode_codec(
        _enc_df(spark),
        "cef",
        {"vendor": "V", "product": "P", "device_version": "9",
         "ext_fields": ["metric"]},
    )
    lines = sorted(r["message"] for r in out.collect())
    assert lines[0].startswith("CEF:0|V|P|9|sig|evt|sev0|metric=svc.m0")


# ---------------------------------------------------------------------------
# backpressure: byte-denominated micro-batch admission
# ---------------------------------------------------------------------------


def test_max_bytes_per_trigger_bounds_batches(spark, tmp_path):
    """maxBytesPerTrigger (the PQ `queue.max_bytes` analog) admits files
    by SIZE: landing 8 parquet files and capping each trigger at ~one
    file's bytes must drain in >1 micro-batch with no row lost."""
    from logstash_spark.streaming.pipeline import file_stream_source

    landing = str(tmp_path / "landing")
    spark.range(0, 8000, 1, 8).withColumn(
        "pad", F.md5(F.col("id").cast("string"))
    ).write.parquet(landing)
    one_file = min(
        os.path.getsize(os.path.join(landing, f))
        for f in os.listdir(landing)
        if f.endswith(".parquet")
    )
    schema = spark.read.parquet(landing).schema
    stream = file_stream_source(
        spark, landing, schema, max_bytes_per_trigger=one_file
    )
    batches: list[int] = []

    def sink(df, epoch_id):
        batches.append(df.count())

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sum(batches) == 8000
    assert len([b for b in batches if b]) > 1, batches

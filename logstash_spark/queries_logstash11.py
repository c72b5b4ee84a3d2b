"""Correctness-gate queries, batch 11 (round 3): binary wire-format
codecs — NetFlow v5, Avro datum, fluent/msgpack, collectd network
protocol (operators/wire.py).

Parity discipline: every blob under test is synthesized IN-QUERY from
events-table arithmetic (deterministic encoders: pure hex-concat column
algebra for the fixed-layout formats, pinned-order varint encoders for
Avro/msgpack), then pushed through the decode operator; the DuckDB
oracle recomputes every decoded field INDEPENDENTLY from event_id
arithmetic — it never sees the bytes, so any framing, endianness,
varint, or zigzag defect breaks the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# NetFlow v5 (wire.netflow_decode) — numpy-vectorized binary fan-out
# ---------------------------------------------------------------------------


@query(
    "netflow_codec",
    """
    WITH flows AS (
      SELECT e.event_id, CAST(gs.i AS INT) AS flow_no,
             CAST(e.event_id % 3 + 1 AS INT) AS flow_records
      FROM events e,
           LATERAL (SELECT unnest(range(0, CAST(e.event_id % 3 + 1 AS BIGINT)))
                    AS i) gs
    )
    SELECT event_id, flow_no, flow_records,
           '10.' || CAST(event_id % 200 AS VARCHAR) || '.' ||
             CAST(flow_no AS VARCHAR) || '.' ||
             CAST(event_id % 250 AS VARCHAR) AS ipv4_src_addr,
           '192.168.' || CAST(flow_no AS VARCHAR) || '.' ||
             CAST(event_id % 254 + 1 AS VARCHAR) AS ipv4_dst_addr,
           CAST(event_id % 1000 + flow_no + 1 AS BIGINT) AS in_pkts,
           CAST((event_id % 1000 + flow_no + 1) * 64 AS BIGINT) AS in_bytes,
           CAST((1700000000 + event_id % 100000) * 1000 + event_id % 1000
                - (3600000 + event_id % 1000)
                + 3500000 + flow_no * 1000 AS BIGINT) AS first_switched_ms,
           CAST((1700000000 + event_id % 100000) * 1000 + event_id % 1000
                - (3600000 + event_id % 1000)
                + 3500000 + flow_no * 1000 + 500 AS BIGINT) AS last_switched_ms,
           CAST(1024 + event_id % 60000 AS INT) AS l4_src_port,
           CAST(CASE WHEN event_id % 2 = 0 THEN 443 ELSE 80 END AS INT)
             AS l4_dst_port,
           CAST(CASE WHEN (event_id + flow_no) % 2 = 0 THEN 27 ELSE 0 END
                AS INT) AS tcp_flags,
           CAST(CASE WHEN (event_id + flow_no) % 2 = 0 THEN 6 ELSE 17 END
                AS INT) AS protocol,
           CAST(event_id % 64000 AS INT) AS src_as,
           CAST((event_id * 7) % 64000 AS INT) AS dst_as,
           CAST(24 AS INT) AS src_mask, CAST(16 AS INT) AS dst_mask,
           CAST(event_id AS BIGINT) AS flow_seq_num,
           CAST(event_id % 4 AS INT) AS engine_id,
           CAST(1700000000 + event_id % 100000 AS BIGINT) AS unix_sec
    FROM flows
    """,
)
def netflow_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NetFlow v5 round trip (reference: logstash-codec-netflow §decode,
    Netflow5PDU): packets are assembled in PURE column algebra
    (hex-concat → unhex, zero UDF) with `event_id % 3 + 1` flow records
    each, then decoded by the numpy-vectorized `netflow_decode`
    (ONE frombuffer per Arrow batch). The oracle recomputes every header
    and flow field — dotted-quad strings, the uptime→epoch-ms
    SwitchedTime conversion, two's-complement-free unsigned widths —
    from event_id arithmetic alone. Plan: one codegen projection + one
    mapInPandas, zero shuffle."""
    from logstash_spark.operators.wire import netflow_decode, netflow_encode

    e = F.col("event_id")
    pkt = netflow_encode(
        _ev(spark, sf_dir).select("event_id"),
        count=(e % 3 + 1).cast("int"),
        header={
            "sys_uptime": F.lit(3_600_000) + e % 1000,
            "unix_secs": F.lit(1_700_000_000) + e % 100000,
            "unix_nsecs": (e % 1000) * 1_000_000,
            "flow_sequence": e,
            "engine_type": F.lit(1),
            "engine_id": e % 4,
        },
        record={
            "srcaddr": lambda i: F.lit(167_772_160)
            + (e % 200) * 65536 + i * 256 + e % 250,
            "dstaddr": lambda i: F.lit(3_232_235_520) + i * 256 + e % 254 + 1,
            "input": F.lit(1),
            "output": F.lit(2),
            "dPkts": lambda i: e % 1000 + i + 1,
            "dOctets": lambda i: (e % 1000 + i + 1) * 64,
            "first": lambda i: F.lit(3_500_000) + i * 1000,
            "last": lambda i: F.lit(3_500_000) + i * 1000 + 500,
            "srcport": F.lit(1024) + e % 60000,
            "dstport": F.when(e % 2 == 0, 443).otherwise(80),
            "tcp_flags": lambda i: F.when((e + i) % 2 == 0, 27).otherwise(0),
            "prot": lambda i: F.when((e + i) % 2 == 0, 6).otherwise(17),
            "src_as": e % 64000,
            "dst_as": (e * 7) % 64000,
            "src_mask": F.lit(24),
            "dst_mask": F.lit(16),
        },
    )
    out = netflow_decode(pkt, "packet")
    return out.select(
        "event_id", "flow_no", "flow_records",
        "ipv4_src_addr", "ipv4_dst_addr", "in_pkts", "in_bytes",
        "first_switched_ms", "last_switched_ms",
        "l4_src_port", "l4_dst_port", "tcp_flags", "protocol",
        "src_as", "dst_as", "src_mask", "dst_mask",
        "flow_seq_num", "engine_id", "unix_sec",
    )


# ---------------------------------------------------------------------------
# Avro binary datum (wire.avro_decode / avro_encode)
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = [
    ("rec_id", "long"),
    ("name", "string"),
    ("ok", "boolean"),
    ("score", "double"),
    ("note", "string?"),
]


@query(
    "avro_codec",
    """
    SELECT event_id,
           CAST(event_id * 131 - 500000 AS BIGINT) AS rec_id,
           event_type AS name,
           event_id % 2 = 0 AS ok,
           CAST(event_id AS DOUBLE) / 4.0 AS score,
           CASE WHEN event_id % 5 = 0 THEN NULL
                ELSE 'note-' || CAST(event_id AS VARCHAR) END AS note,
           0 AS n_tags
    FROM events
    """,
)
def avro_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro binary-datum round trip (reference: logstash-codec-avro
    §decode/§encode — one schema'd datum per event, no container file):
    zigzag-varint longs incl. negatives, UTF-8 strings, booleans,
    little-endian IEEE doubles, and the ["null","string"] union with
    branch indices. Encode → decode on the Spark side; the oracle
    recomputes the record from event arithmetic. n_tags proves no row
    grew a `_avroparsefailure` tag."""
    from logstash_spark.operators.wire import avro_decode, avro_encode

    e = F.col("event_id")
    src = _ev(spark, sf_dir).select(
        "event_id",
        (e * 131 - 500000).alias("rec_id"),
        F.col("event_type").alias("name"),
        (e % 2 == 0).alias("ok"),
        (e.cast("double") / 4.0).alias("score"),
        F.when(e % 5 != 0, F.concat(F.lit("note-"), e.cast("string")))
        .alias("note"),
    )
    enc = avro_encode(src, _AVRO_SCHEMA).select("event_id", "avro_datum")
    dec = avro_decode(enc, "avro_datum", _AVRO_SCHEMA)
    return dec.select(
        "event_id", "rec_id", "name", "ok", "score", "note",
        F.size("tags").cast("int").alias("n_tags"),
    )


# ---------------------------------------------------------------------------
# fluent forward protocol (wire.fluent_decode / fluent_encode)
# ---------------------------------------------------------------------------

_FLUENT_SCHEMA = [("msg", "string"), ("n", "bigint"), ("ratio", "double")]


@query(
    "fluent_codec",
    """
    SELECT event_id,
           'app.' || event_type AS fluent_tag,
           CAST(1700000000 + event_id % 86400 AS BIGINT) AS fluent_time,
           'm-' || CAST(event_id AS VARCHAR) AS msg,
           CAST(event_id * 3 AS BIGINT) AS n,
           CAST(event_id AS DOUBLE) / 8.0 AS ratio,
           0 AS n_tags
    FROM events
    """,
)
def fluent_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fluent forward-protocol round trip (reference:
    logstash-codec-fluent §decode — the msgpack triple
    [tag, time, record]): tag/time plus a record map of string, uint
    varint, and float64 values, encoded with the deterministic
    key-ordered msgpack writer and decoded back through the
    schema-pinned fluent_decode. Oracle recomputes tag/time/record from
    event arithmetic; n_tags proves zero `_fluentparsefailure`."""
    from logstash_spark.operators.wire import fluent_decode, fluent_encode

    e = F.col("event_id")
    src = _ev(spark, sf_dir).select(
        "event_id",
        F.concat(F.lit("m-"), e.cast("string")).alias("msg"),
        (e * 3).alias("n"),
        (e.cast("double") / 8.0).alias("ratio"),
        F.concat(F.lit("app."), F.col("event_type")).alias("tag_src"),
    )
    enc = fluent_encode(
        src,
        ["msg", "n", "ratio"],
        tag=F.col("tag_src"),
        time=F.lit(1_700_000_000) + e % 86400,
    ).select("event_id", "fluent_msg")
    dec = fluent_decode(enc, "fluent_msg", _FLUENT_SCHEMA)
    return dec.select(
        "event_id", "fluent_tag", "fluent_time", "msg", "n", "ratio",
        F.size("tags").cast("int").alias("n_tags"),
    )


# ---------------------------------------------------------------------------
# collectd binary network protocol (wire.collectd_decode)
# ---------------------------------------------------------------------------


@query(
    "collectd_codec",
    """
    SELECT event_id,
           'host-' || CAST(event_id % 20 AS VARCHAR) AS host,
           'cpu' AS plugin,
           'derive' AS type,
           event_type AS type_instance,
           CAST(1700000000 + event_id % 1000 AS BIGINT) AS time_s,
           CAST(60 AS BIGINT) AS interval_s,
           'derive' AS ds_type,
           CAST((event_id * 13) % 100000 - 50000 AS BIGINT) AS value_counter
    FROM events
    """,
)
def collectd_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collectd network-protocol round trip (reference:
    logstash-codec-collectd §decode — TLV parts with sticky context,
    VALUES parts emitting events): packets are assembled in pure column
    algebra (NUL-terminated length-prefixed string parts, u64 time /
    interval parts, a signed big-endian DERIVE data source — negative
    values exercise two's complement) and decoded by the part-stream
    state machine. Oracle recomputes host/context/value from event
    arithmetic."""
    from logstash_spark.operators.wire import (
        collectd_decode,
        collectd_encode_single_derive,
    )

    e = F.col("event_id")
    pkt = collectd_encode_single_derive(
        _ev(spark, sf_dir).select("event_id", "event_type"),
        host=F.concat(F.lit("host-"), (e % 20).cast("string")),
        plugin=F.lit("cpu"),
        type_=F.lit("derive"),
        type_instance=F.col("event_type"),
        time_s=F.lit(1_700_000_000) + e % 1000,
        interval_s=F.lit(60),
        value=(e * 13) % 100000 - 50000,
    ).select("event_id", "packet")
    out = collectd_decode(pkt, "packet")
    return out.select(
        "event_id", "host", "plugin", "type", "type_instance",
        "time_s", "interval_s", "ds_type", "value_counter",
    )


# ---------------------------------------------------------------------------
# cloudtrail codec (codec.cloudtrail_decode)
# ---------------------------------------------------------------------------

_CT_SCHEMA = (
    "eventName STRING, awsRegion STRING, sourceIPAddress STRING, "
    "userIdentity STRUCT<type:STRING>, eventID BIGINT"
)


@query(
    "cloudtrail_codec",
    """
    SELECT e.event_id,
           CAST(gs.i AS INT) AS record_no,
           e.event_type || '-' || CAST(gs.i AS VARCHAR) AS eventName,
           'us-east-' || CAST(e.event_id % 3 + 1 AS VARCHAR) AS awsRegion,
           '10.0.' || CAST(e.event_id % 256 AS VARCHAR) || '.' ||
             CAST(gs.i AS VARCHAR) AS sourceIPAddress,
           CASE WHEN (e.event_id + gs.i) % 4 = 0 THEN 'Root'
                ELSE 'IAMUser' END AS identity_type,
           CAST(e.event_id * 10 + gs.i AS BIGINT) AS eventID
    FROM events e,
         LATERAL (SELECT unnest(range(0, 2)) AS i) gs
    """,
)
def cloudtrail_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CloudTrail delivery-blob split (reference: logstash-codec-cloudtrail
    §decode — one event per element of the Records array): the blob is
    synthesized in-query as real JSON (two records per event, nested
    userIdentity struct), decoded via ONE from_json(array<struct>) +
    posexplode — zero UDF, zero shuffle. Oracle recomputes each record's
    fields from event arithmetic without parsing JSON."""
    from logstash_spark.operators.codec import cloudtrail_decode

    e = F.col("event_id")

    def rec(i: int) -> F.Column:
        ident = F.when((e + F.lit(i)) % 4 == 0, "Root").otherwise("IAMUser")
        return F.concat(
            F.lit('{"eventName":"'), F.col("event_type"), F.lit(f"-{i}"),
            F.lit('","awsRegion":"us-east-'), (e % 3 + 1).cast("string"),
            F.lit('","sourceIPAddress":"10.0.'), (e % 256).cast("string"),
            F.lit(f'.{i}"'),
            F.lit(',"userIdentity":{"type":"'), ident, F.lit('"}'),
            F.lit(',"eventID":'), (e * 10 + i).cast("string"), F.lit("}"),
        )

    blob = F.concat(F.lit('{"Records":['), rec(0), F.lit(","), rec(1), F.lit("]}"))
    src = _ev(spark, sf_dir).select("event_id", blob.alias("blob"))
    out = cloudtrail_decode(src, "blob", _CT_SCHEMA)
    return out.select(
        "event_id",
        F.col("record_no").cast("int"),
        "eventName", "awsRegion", "sourceIPAddress",
        F.col("userIdentity.type").alias("identity_type"),
        "eventID",
    )


# ---------------------------------------------------------------------------
# protobuf wire format (wire.protobuf_decode / protobuf_encode)
# ---------------------------------------------------------------------------

_PB_SCHEMA = [
    (1, "rec_id", "sint64"),
    (2, "name", "string"),
    (3, "ok", "bool"),
    (4, "score", "double"),
    (5, "big", "fixed64"),
]


@query(
    "protobuf_codec",
    """
    SELECT event_id,
           CAST(event_id * 7 - 30000 AS BIGINT) AS rec_id,
           event_type AS name,
           event_id % 2 = 0 AS ok,
           CAST(event_id AS DOUBLE) / 4.0 AS score,
           CAST(event_id * 1000000 + 1 AS BIGINT) AS big,
           0 AS n_tags
    FROM events
    """,
)
def protobuf_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """protobuf wire-format round trip (reference:
    logstash-codec-protobuf §decode): zigzag sint64 (negatives), UTF-8
    strings, bool varints, little-endian doubles and fixed64 — encoded
    with `emit_defaults=True` so proto3 zero-skip doesn't turn falsy
    values into nulls, decoded by the schema-driven wire reader (no
    protobuf library — the wire format is varint tags + 4 payload
    kinds). Oracle recomputes every field from event arithmetic; n_tags
    proves zero `_protobufdecodefailure`."""
    from logstash_spark.operators.wire import protobuf_decode, protobuf_encode

    e = F.col("event_id")
    src = _ev(spark, sf_dir).select(
        "event_id",
        (e * 7 - 30000).alias("rec_id"),
        F.col("event_type").alias("name"),
        (e % 2 == 0).alias("ok"),
        (e.cast("double") / 4.0).alias("score"),
        (e * 1_000_000 + 1).alias("big"),
    )
    enc = protobuf_encode(src, _PB_SCHEMA, emit_defaults=True).select(
        "event_id", "pb_msg"
    )
    dec = protobuf_decode(enc, "pb_msg", _PB_SCHEMA)
    return dec.select(
        "event_id", "rec_id", "name", "ok", "score", "big",
        F.size("tags").cast("int").alias("n_tags"),
    )

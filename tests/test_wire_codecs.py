"""Binary wire codecs: NetFlow v5, Avro datum, msgpack/fluent, collectd.

Golden-byte tests: blobs are hand-packed with struct (independent of the
operators' own encoders), so encoder and decoder cannot share a bug.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from logstash_spark.operators.wire import (
    _mp_decode,
    _mp_encode,
    avro_decode,
    avro_encode,
    collectd_decode,
    collectd_encode_single_gauge,
    fluent_decode,
    fluent_encode,
    netflow_decode,
    netflow_encode,
)


def _nf5_packet(
    flows: list[dict],
    *,
    sys_uptime=3_600_000,
    unix_secs=1_700_000_000,
    unix_nsecs=500_000_000,
    flow_seq=42,
    engine_type=1,
    engine_id=3,
    sampling=0,
) -> bytes:
    hdr = struct.pack(
        ">HHIIIIBBH",
        5,
        len(flows),
        sys_uptime,
        unix_secs,
        unix_nsecs,
        flow_seq,
        engine_type,
        engine_id,
        sampling,
    )
    recs = b""
    for f_ in flows:
        recs += struct.pack(
            ">IIIHHIIIIHHBBBBHHBBH",
            f_["src"], f_["dst"], f_.get("nh", 0),
            f_.get("in", 1), f_.get("out", 2),
            f_["pkts"], f_["octets"],
            f_["first"], f_["last"],
            f_["sport"], f_["dport"],
            0, f_.get("flags", 0x1B), f_.get("prot", 6), f_.get("tos", 0),
            f_.get("sas", 64512), f_.get("das", 65000),
            24, 16, 0,
        )
    return hdr + recs


class TestNetflow:
    def test_golden_two_flows(self, spark):
        pkt = _nf5_packet(
            [
                {"src": 0x0A000001, "dst": 0xC0A80101, "pkts": 10,
                 "octets": 640, "first": 3_590_000, "last": 3_599_000,
                 "sport": 12345, "dport": 443},
                {"src": 0x0A000002, "dst": 0xC0A80102, "pkts": 3,
                 "octets": 180, "first": 3_591_000, "last": 3_592_000,
                 "sport": 54321, "dport": 80, "prot": 17},
            ]
        )
        df = spark.createDataFrame([(1, pkt)], "id int, blob binary")
        out = netflow_decode(df, "blob").orderBy("flow_no").collect()
        assert len(out) == 2
        r0, r1 = out
        assert r0.ipv4_src_addr == "10.0.0.1"
        assert r0.ipv4_dst_addr == "192.168.1.1"
        assert r0.in_pkts == 10 and r0.in_bytes == 640
        assert r0.l4_src_port == 12345 and r0.l4_dst_port == 443
        assert r0.protocol == 6 and r1.protocol == 17
        assert r0.src_as == 64512 and r0.dst_as == 65000
        assert r0.src_mask == 24 and r0.dst_mask == 16
        assert r0.netflow_version == 5 and r0.flow_records == 2
        assert r0.flow_seq_num == 42
        assert r0.engine_type == 1 and r0.engine_id == 3
        # epoch-ms conversion: unix_secs*1000 + nsecs//1e6 - uptime + first
        base = 1_700_000_000 * 1000 + 500 - 3_600_000
        assert r0.first_switched_ms == base + 3_590_000
        assert r0.last_switched_ms == base + 3_599_000
        assert r1.flow_no == 1 and r0.id == 1 and r1.id == 1

    def test_malformed_dropped(self, spark):
        good = _nf5_packet([{ "src": 1, "dst": 2, "pkts": 1, "octets": 1,
                              "first": 0, "last": 0, "sport": 1, "dport": 2}])
        rows = [
            (1, good),
            (2, good[:-5]),            # truncated
            (3, b"\x00\x09" + good[2:]),  # version 9
            (4, None),
            (5, b"\x00"),              # shorter than header
        ]
        df = spark.createDataFrame(rows, "id int, blob binary")
        out = netflow_decode(df, "blob").collect()
        assert [r.id for r in out] == [1]

    def test_encode_roundtrip_matches_golden(self, spark):
        """netflow_encode (pure column algebra) must emit the exact bytes
        struct.pack does."""
        df = spark.range(1).select(F.lit(7).alias("e"))
        enc = netflow_encode(
            df,
            count=F.lit(2),
            header={
                "sys_uptime": F.lit(3_600_000),
                "unix_secs": F.lit(1_700_000_000),
                "unix_nsecs": F.lit(500_000_000),
                "flow_sequence": F.lit(42),
                "engine_type": F.lit(1),
                "engine_id": F.lit(3),
            },
            record={
                "srcaddr": lambda i: F.lit(0x0A000001) + i,
                "dstaddr": lambda i: F.lit(0xC0A80101) + i,
                "input": F.lit(1), "output": F.lit(2),
                "dPkts": lambda i: F.when(i == 0, 10).otherwise(3),
                "dOctets": lambda i: F.when(i == 0, 640).otherwise(180),
                "first": lambda i: F.lit(3_590_000) + i * 1000,
                "last": lambda i: F.when(i == 0, 3_599_000).otherwise(3_592_000),
                "srcport": lambda i: F.when(i == 0, 12345).otherwise(54321),
                "dstport": lambda i: F.when(i == 0, 443).otherwise(80),
                "tcp_flags": F.lit(0x1B),
                "prot": lambda i: F.when(i == 0, 6).otherwise(17),
                "src_as": F.lit(64512), "dst_as": F.lit(65000),
                "src_mask": F.lit(24), "dst_mask": F.lit(16),
            },
        )
        got = bytes(enc.collect()[0].packet)
        want = _nf5_packet(
            [
                {"src": 0x0A000001, "dst": 0xC0A80101, "pkts": 10,
                 "octets": 640, "first": 3_590_000, "last": 3_599_000,
                 "sport": 12345, "dport": 443},
                {"src": 0x0A000002, "dst": 0xC0A80102, "pkts": 3,
                 "octets": 180, "first": 3_591_000, "last": 3_592_000,
                 "sport": 54321, "dport": 80, "prot": 17},
            ]
        )
        assert got == want


_AVRO_SCHEMA = [
    ("rec_id", "long"),
    ("name", "string"),
    ("ok", "boolean"),
    ("score", "double"),
    ("note", "string?"),
]


def _avro_golden(rec_id, name, ok, score, note) -> bytes:
    def zz(n):
        z = (n << 1) ^ (n >> 63)
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    raw = name.encode()
    out = zz(rec_id) + zz(len(raw)) + raw + bytes([1 if ok else 0])
    out += struct.pack("<d", score)
    if note is None:
        out += zz(0)
    else:
        nb = note.encode()
        out += zz(1) + zz(len(nb)) + nb
    return out


class TestAvro:
    def test_golden_decode(self, spark):
        rows = [
            (1, _avro_golden(12345, "héllo", True, 2.5, "x")),
            (2, _avro_golden(-7, "", False, -0.25, None)),
            (3, b"\x80"),  # truncated varint → failure tag
            (4, None),
        ]
        df = spark.createDataFrame(rows, "id int, blob binary")
        out = {r.id: r for r in avro_decode(df, "blob", _AVRO_SCHEMA).collect()}
        assert out[1].rec_id == 12345 and out[1].name == "héllo"
        assert out[1].ok is True and out[1].score == 2.5
        assert out[1].note == "x" and out[1].tags == []
        assert out[2].rec_id == -7 and out[2].note is None
        assert out[2].score == -0.25
        assert out[3].rec_id is None
        assert out[3].tags == ["_avroparsefailure"]
        assert out[4].tags == ["_avroparsefailure"]

    def test_roundtrip(self, spark):
        df = spark.range(50).select(
            F.col("id").alias("rec_id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            (F.col("id") % 2 == 0).alias("ok"),
            (F.col("id") / 4.0).alias("score"),
            F.when(F.col("id") % 5 != 0, F.concat(F.lit("note"), F.col("id")))
             .alias("note"),
        )
        enc = avro_encode(df, _AVRO_SCHEMA)
        dec = avro_decode(
            enc.select(F.col("rec_id").alias("orig_id"), "avro_datum"),
            "avro_datum",
            _AVRO_SCHEMA,
        )
        rows = dec.collect()
        assert len(rows) == 50
        for r in rows:
            assert r.rec_id == r.orig_id
            assert r.name == f"n{r.orig_id}"
            assert r.ok == (r.orig_id % 2 == 0)
            assert r.score == r.orig_id / 4.0
            expect_note = None if r.orig_id % 5 == 0 else f"note{r.orig_id}"
            assert r.note == expect_note
            assert r.tags == []


class TestMsgpackPrimitives:
    @pytest.mark.parametrize(
        "val",
        [
            None, True, False, 0, 1, 127, 128, 255, 256, 65535, 65536,
            2**32, 2**63 - 1, -1, -32, -33, -128, -129, -(2**31), -(2**63),
            1.5, -2.25, "", "a", "x" * 31, "y" * 32, "z" * 300, "héllo",
            b"\x00\xff", [], [1, "a", None], list(range(20)),
            {}, {"k": 1, "s": "v"}, {"nested": {"a": [1, 2]}},
            ["tag", 1700000000, {"msg": "hi", "n": 3}],
        ],
    )
    def test_roundtrip(self, val):
        v, pos = _mp_decode(_mp_encode(val))
        assert v == val
        assert pos == len(_mp_encode(val))

    def test_golden_bytes(self):
        # spec examples: fixstr, fixmap, uint16
        assert _mp_encode("abc") == b"\xa3abc"
        assert _mp_encode({"a": 1}) == b"\x81\xa1a\x01"
        assert _mp_encode(1000) == b"\xcd\x03\xe8"
        assert _mp_encode(-100) == b"\xd0\x9c"
        assert _mp_encode(None) == b"\xc0"


_FLUENT_SCHEMA = [("msg", "string"), ("n", "bigint"), ("ratio", "double")]


class TestFluent:
    def test_golden_decode(self, spark):
        blob = _mp_encode(
            ["app.web", 1_700_000_123, {"msg": "hello", "n": 7, "ratio": 0.5,
                                        "extra": "dropped"}]
        )
        bad = b"\x93\xa3app"  # truncated
        df = spark.createDataFrame(
            [(1, blob), (2, bad)], "id int, blob binary"
        )
        out = {r.id: r for r in
               fluent_decode(df, "blob", _FLUENT_SCHEMA).collect()}
        assert out[1].fluent_tag == "app.web"
        assert out[1].fluent_time == 1_700_000_123
        assert out[1].msg == "hello" and out[1].n == 7 and out[1].ratio == 0.5
        assert out[1].tags == []
        assert out[2].fluent_tag is None
        assert out[2].tags == ["_fluentparsefailure"]

    def test_roundtrip(self, spark):
        df = spark.range(30).select(
            F.concat(F.lit("m"), F.col("id")).alias("msg"),
            (F.col("id") * 3).alias("n"),
            (F.col("id") / 8.0).alias("ratio"),
        )
        enc = fluent_encode(
            df,
            ["msg", "n", "ratio"],
            tag=F.lit("t.x"),
            time=F.lit(1_700_000_000) + F.col("n"),
        )
        dec = fluent_decode(
            enc.select(F.col("n").alias("orig_n"), "fluent_msg"),
            "fluent_msg",
            _FLUENT_SCHEMA,
        )
        for r in dec.collect():
            assert r.fluent_tag == "t.x"
            assert r.fluent_time == 1_700_000_000 + r.orig_n
            assert r.n == r.orig_n and r.msg == f"m{r.orig_n // 3}"
            assert r.ratio == (r.orig_n // 3) / 8.0


def _cd_str(ptype, s):
    b = s.encode() + b"\x00"
    return struct.pack(">HH", ptype, 4 + len(b)) + b


def _cd_u64(ptype, v):
    return struct.pack(">HHQ", ptype, 12, v)


class TestCollectd:
    def test_golden_sticky_context(self, spark):
        pkt = (
            _cd_str(0x0000, "web01")
            + _cd_u64(0x0008, 1_700_000_000 << 30)  # time_hr
            + _cd_str(0x0002, "cpu")
            + _cd_str(0x0004, "cpu")
            + _cd_str(0x0005, "idle")
            + _cd_u64(0x0007, 10)  # interval
            # VALUES: one gauge (LE double) + one derive (BE int64)
            + struct.pack(">HHH", 0x0006, 4 + 2 + 2 + 16, 2)
            + bytes([1, 2])
            + struct.pack("<d", 99.5)
            + struct.pack(">q", -12345)
            # context change, second VALUES: one counter
            + _cd_str(0x0005, "user")
            + struct.pack(">HHH", 0x0006, 4 + 2 + 1 + 8, 1)
            + bytes([0])
            + struct.pack(">Q", 2**40)
        )
        df = spark.createDataFrame([(1, pkt)], "id int, blob binary")
        out = collectd_decode(df, "blob").orderBy(
            "type_instance", "value_no"
        ).collect()
        assert len(out) == 3
        idle0, idle1, user0 = out
        assert idle0.host == "web01" and idle0.plugin == "cpu"
        assert idle0.type == "cpu" and idle0.type_instance == "idle"
        assert idle0.time_s == 1_700_000_000 and idle0.interval_s == 10
        assert idle0.ds_type == "gauge" and idle0.value_gauge == 99.5
        assert idle0.value_counter is None
        assert idle1.ds_type == "derive" and idle1.value_counter == -12345
        assert user0.type_instance == "user"
        assert user0.ds_type == "counter" and user0.value_counter == 2**40

    def test_encode_helper_roundtrip(self, spark):
        bits = struct.unpack(">q", struct.pack(">d", 42.125))[0]
        df = spark.range(1)
        enc = collectd_encode_single_gauge(
            df,
            host=F.lit("h1"),
            plugin=F.lit("load"),
            type_=F.lit("load"),
            time_s=F.lit(1_700_000_777),
            interval_s=F.lit(60),
            gauge_bits=F.lit(bits),
        )
        out = collectd_decode(enc, "packet").collect()
        assert len(out) == 1
        r = out[0]
        assert r.host == "h1" and r.plugin == "load"
        assert r.time_s == 1_700_000_777 and r.interval_s == 60
        assert r.ds_type == "gauge" and r.value_gauge == 42.125


class TestCloudtrail:
    def test_split_and_failure(self, spark):
        from logstash_spark.operators.codec import cloudtrail_decode

        good = (
            '{"Records":[{"eventName":"RunInstances","awsRegion":"us-east-1",'
            '"userIdentity":{"type":"IAMUser"},"eventID":10},'
            '{"eventName":"StopInstances","awsRegion":"eu-west-1",'
            '"userIdentity":{"type":"Root"},"eventID":11}]}'
        )
        rows = [(1, good), (2, "not json"), (3, '{"other": 1}')]
        df = spark.createDataFrame(rows, "id int, blob string")
        out = cloudtrail_decode(
            df, "blob",
            "eventName STRING, awsRegion STRING, "
            "userIdentity STRUCT<type:STRING>, eventID BIGINT",
        ).orderBy("id", "record_no").collect()
        assert len(out) == 2  # bad blobs produce zero events
        assert out[0].eventName == "RunInstances"
        assert out[0].userIdentity.type == "IAMUser"
        assert out[1].record_no == 1 and out[1].eventID == 11


_PB_SCHEMA = [
    (1, "rec_id", "sint64"),
    (2, "name", "string"),
    (3, "ok", "bool"),
    (4, "score", "double"),
    (5, "big", "fixed64"),
]


def _pb_varint_bytes(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_golden(rec_id, name, ok, score, big) -> bytes:
    out = bytearray()
    zz = (rec_id << 1) ^ (rec_id >> 63)
    out += _pb_varint_bytes(1 << 3 | 0) + _pb_varint_bytes(zz)
    raw = name.encode()
    out += _pb_varint_bytes(2 << 3 | 2) + _pb_varint_bytes(len(raw)) + raw
    out += _pb_varint_bytes(3 << 3 | 0) + _pb_varint_bytes(1 if ok else 0)
    out += _pb_varint_bytes(4 << 3 | 1) + struct.pack("<d", score)
    out += _pb_varint_bytes(5 << 3 | 1) + big.to_bytes(8, "little")
    return bytes(out)


class TestProtobuf:
    def test_golden_decode(self, spark):
        from logstash_spark.operators.wire import protobuf_decode

        # field 99 is unknown (varint) — must be skipped, not fail
        unknown = _pb_varint_bytes(99 << 3 | 0) + _pb_varint_bytes(7)
        rows = [
            (1, _pb_golden(-12345, "héllo", True, 2.5, 2**50)),
            (2, unknown + _pb_golden(0, "", False, 0.0, 0)),
            (3, b"\x0a\xff"),  # truncated length-delimited
            (4, None),
        ]
        df = spark.createDataFrame(rows, "id int, blob binary")
        out = {r.id: r for r in
               protobuf_decode(df, "blob", _PB_SCHEMA).collect()}
        assert out[1].rec_id == -12345 and out[1].name == "héllo"
        assert out[1].ok is True and out[1].score == 2.5
        assert out[1].big == 2**50 and out[1].tags == []
        assert out[2].rec_id == 0 and out[2].tags == []
        assert out[3].tags == ["_protobufdecodefailure"]
        assert out[4].tags == ["_protobufdecodefailure"]

    def test_roundtrip_with_defaults(self, spark):
        from logstash_spark.operators.wire import (
            protobuf_decode,
            protobuf_encode,
        )

        df = spark.range(40).select(
            (F.col("id") * 7 - 100).alias("rec_id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            (F.col("id") % 2 == 0).alias("ok"),
            (F.col("id") / 4.0).alias("score"),
            (F.col("id") * 1000).alias("big"),
        )
        enc = protobuf_encode(df, _PB_SCHEMA, emit_defaults=True)
        dec = protobuf_decode(
            enc.select(F.col("rec_id").alias("orig"), "pb_msg"),
            "pb_msg",
            _PB_SCHEMA,
        )
        for r in dec.collect():
            assert r.rec_id == r.orig
            i = (r.orig + 100) // 7
            assert r.name == f"n{i}" and r.ok == (i % 2 == 0)
            assert r.score == i / 4.0 and r.big == i * 1000
            assert r.tags == []

    def test_proto3_zero_skip(self, spark):
        """Without emit_defaults, zero/empty scalars are absent on the
        wire and decode as null (proto3 default-absence)."""
        from logstash_spark.operators.wire import (
            protobuf_decode,
            protobuf_encode,
        )

        df = spark.createDataFrame(
            [(0, "", False, 0.0, 0)],
            "rec_id bigint, name string, ok boolean, score double, big bigint",
        )
        enc = protobuf_encode(df, _PB_SCHEMA)
        blob = bytes(enc.collect()[0].pb_msg)
        assert blob == b""  # all defaults → empty message
        dec = protobuf_decode(enc.select("pb_msg"), "pb_msg", _PB_SCHEMA)
        r = dec.collect()[0]
        assert r.rec_id is None and r.name is None and r.ok is None
        assert r.tags == []

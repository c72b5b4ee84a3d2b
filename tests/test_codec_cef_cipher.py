"""CEF codec decode/encode, cipher AES round-trip, json_encode forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logstash_spark.functions import cipher
from logstash_spark.operators.codec import cef_decode, cef_encode
from logstash_spark.operators.parse import json_encode


class TestCefDecode:
    def test_headers_and_extension(self, spark):
        line = (
            "CEF:0|Acme|Fire\\|wall|1.0|sig42|port\\|scan detected|7|"
            "src=10.0.0.1 spt=6001 msg=blocked by rule 3 fname=a\\=b act=deny"
        )
        df = spark.createDataFrame([(1, line)], "id long, message string")
        row = cef_decode(df, "message", ext_target="ext").collect()[0]
        assert row["cef_version"] == 0
        assert row["device_vendor"] == "Acme"
        assert row["device_product"] == "Fire|wall"
        assert row["device_version"] == "1.0"
        assert row["signature_id"] == "sig42"
        assert row["cef_name"] == "port|scan detected"
        assert row["severity"] == "7"
        assert row["ext"]["src"] == "10.0.0.1"
        assert row["ext"]["msg"] == "blocked by rule 3"
        assert row["ext"]["fname"] == "a=b"
        assert row["ext"]["act"] == "deny"
        assert row["tags"] == []

    def test_non_cef_row_tags_failure(self, spark):
        df = spark.createDataFrame(
            [(1, "plain syslog, no cef"), (2, "CEF:1|v|p|1|s|n|5|src=1.2.3.4")],
            "id long, message string",
        )
        rows = {r["id"]: r for r in cef_decode(df, "message").collect()}
        assert rows[1]["tags"] == ["_cefparsefailure"]
        assert rows[1]["device_vendor"] is None
        assert rows[2]["tags"] == []
        assert rows[2]["cef_version"] == 1
        assert rows[2]["cef_ext"]["src"] == "1.2.3.4"

    def test_encode_decode_round_trip(self, spark):
        df = spark.createDataFrame(
            [(1, "port|scan", 7, "10.0.0.9", "a=b")],
            "sig long, name string, sev long, src string, note string",
        )
        enc = cef_encode(
            df,
            vendor="Acme",
            product="Fire|wall",
            device_version="1.0",
            sig_id="sig",
            name="name",
            severity="sev",
            ext_fields=["src", "note"],
        )
        row = cef_decode(enc, "message", ext_target="ext").collect()[0]
        assert row["device_product"] == "Fire|wall"
        assert row["cef_name"] == "port|scan"
        assert row["signature_id"] == "1"
        assert row["ext"]["src"] == "10.0.0.9"
        assert row["ext"]["note"] == "a=b"


class TestCipher:
    KEY = "0123456789abcdef"

    def test_ecb_round_trip_and_padding_len(self, spark):
        df = spark.createDataFrame(
            [(1, "short"), (2, "exactly sixteen!"), (3, "x" * 33)],
            "id long, plain string",
        )
        enc = cipher(df, "plain", key=self.KEY, mode="encrypt",
                     algorithm="AES-ECB-PKCS", target="ct")
        dec = cipher(enc, "ct", key=self.KEY, mode="decrypt",
                     algorithm="AES-ECB-PKCS", target="rt")
        out = dec.withColumn("ct_len", F.octet_length(F.unbase64("ct")))
        rows = {r["id"]: r for r in out.collect()}
        assert all(rows[i]["rt"] == p for i, p in
                   ((1, "short"), (2, "exactly sixteen!"), (3, "x" * 33)))
        # PKCS always pads: 16*(len//16 + 1)
        assert rows[1]["ct_len"] == 16
        assert rows[2]["ct_len"] == 32
        assert rows[3]["ct_len"] == 48

    def test_ecb_deterministic(self, spark):
        df = spark.createDataFrame([(1, "same text")], "id long, plain string")
        enc = cipher(df, "plain", key=self.KEY, mode="encrypt",
                     algorithm="AES-ECB-PKCS", target="ct")
        a = enc.collect()[0]["ct"]
        b = enc.collect()[0]["ct"]
        assert a == b

    def test_key_and_mode_validation(self, spark):
        df = spark.createDataFrame([(1, "t")], "id long, plain string")
        with pytest.raises(ValueError, match="key"):
            cipher(df, "plain", key="short", mode="encrypt")
        with pytest.raises(ValueError, match="mode"):
            cipher(df, "plain", key=self.KEY, mode="rot13")
        with pytest.raises(ValueError, match="algorithm"):
            cipher(df, "plain", key=self.KEY, algorithm="DES-ECB")


class TestJsonEncode:
    def test_multi_column_object_order(self, spark):
        df = spark.createDataFrame([("error", 13)], "etype string, uid long")
        out = json_encode(df, ["etype", "uid"], target="j").collect()[0]["j"]
        assert out == '{"etype":"error","uid":13}'

    def test_scalar_wraps_as_object(self, spark):
        df = spark.createDataFrame([(5,)], "v long")
        assert json_encode(df, "v").collect()[0]["v"] == '{"v":5}'

    def test_struct_passthrough_overwrites_in_place(self, spark):
        df = spark.createDataFrame([("a", 1)], "k string, n long").select(
            F.struct("k", "n").alias("s")
        )
        out = json_encode(df, "s")
        assert out.columns == ["s"]
        assert out.collect()[0]["s"] == '{"k":"a","n":1}'

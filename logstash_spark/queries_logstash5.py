"""Correctness-gate queries, batch 5 (round 3): CEF codec decode,
cipher (AES) round-trip, json_encode serialization.

Each Spark query runs the real operator over lines/fields synthesized
deterministically from the events table; each oracle re-derives the
expected values in DuckDB ANSI SQL (the driver hash-compares values
after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# CEF codec (logstash-codec-cef, decode direction)
# ---------------------------------------------------------------------------


@query(
    "cef_codec",
    r"""
    SELECT event_id,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE 0 END AS cef_version,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE 'Acme' END AS device_vendor,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE 'Fire|wall' END AS device_product,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE event_type END AS signature_id,
           CASE WHEN event_id % 101 = 0 THEN NULL
                ELSE 'rule|' || CAST(event_id % 7 AS VARCHAR) END AS cef_name,
           CASE WHEN event_id % 101 = 0 THEN NULL
                ELSE CAST(event_id % 10 AS VARCHAR) END AS severity,
           CASE WHEN event_id % 101 = 0 THEN NULL
                ELSE '10.' || CAST(user_id % 200 AS VARCHAR) || '.'
                     || CAST(event_id % 250 AS VARCHAR) || '.1' END AS src,
           CASE WHEN event_id % 101 = 0 THEN NULL
                ELSE CAST(event_id % 64000 + 1024 AS VARCHAR) END AS spt,
           CASE WHEN event_id % 101 = 0 THEN NULL
                ELSE 'blocked by rule ' || CAST(event_id % 7 AS VARCHAR) END AS msg,
           CASE WHEN event_id % 101 = 0 THEN NULL ELSE 'a=b' END AS fname,
           CASE WHEN event_id % 101 = 0 THEN 1 ELSE 0 END AS failed
    FROM events
    """,
)
def cef_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""CEF decode end-to-end (reference: logstash-codec-cef decode +
    ArcSight CEF spec): pipe-escaped headers (``Fire\|wall`` →
    ``Fire|wall``), multi-word extension values (``msg=blocked by rule
    N`` — next key starts at the next unescaped ``token=``), escaped
    equals in values (``fname=a\=b``), and the ``_cefparsefailure`` tag
    on non-CEF rows (every 101st event is a plain syslog line)."""
    from logstash_spark.operators.codec import cef_decode

    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    src = F.format_string("10.%d.%d.1", uid % 200, eid % 250)
    line = F.concat(
        F.lit("CEF:0|Acme|Fire\\|wall|1.0|"),
        F.col("event_type"),
        F.lit("|rule\\|"),
        (eid % 7).cast("string"),
        F.lit("|"),
        (eid % 10).cast("string"),
        F.lit("|src="),
        src,
        F.lit(" spt="),
        (eid % 64000 + 1024).cast("string"),
        F.lit(" msg=blocked by rule "),
        (eid % 7).cast("string"),
        F.lit(" fname=a\\=b"),
    )
    malformed = F.lit("plain syslog line, not cef")
    ev = ev.withColumn(
        "message", F.when(eid % 101 == 0, malformed).otherwise(line)
    )
    out = cef_decode(ev, "message", ext_target="ext")
    return out.select(
        "event_id",
        "cef_version",
        "device_vendor",
        "device_product",
        "signature_id",
        "cef_name",
        "severity",
        F.col("ext").getItem("src").alias("src"),
        F.col("ext").getItem("spt").alias("spt"),
        F.col("ext").getItem("msg").alias("msg"),
        F.col("ext").getItem("fname").alias("fname"),
        F.array_contains("tags", "_cefparsefailure").cast("int").alias("failed"),
    )


# ---------------------------------------------------------------------------
# Cipher (logstash-filter-cipher analog, Spark aes_encrypt/aes_decrypt)
# ---------------------------------------------------------------------------


@query(
    "cipher_roundtrip",
    """
    SELECT event_id,
           'msg-' || event_type || '-' || CAST(event_id % 1000 AS VARCHAR)
               AS plain_rt,
           CAST(((length('msg-' || event_type || '-'
                 || CAST(event_id % 1000 AS VARCHAR)) // 16) + 1) * 16
                AS BIGINT) AS ct_len
    FROM events
    """,
)
def cipher_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AES-ECB-PKCS encrypt→decrypt round trip (reference:
    logstash-filter-cipher). DuckDB has no AES, so the oracle checks the
    two deterministic invariants end-to-end: the decrypted text equals
    the plaintext, and the ciphertext length is the exact PKCS padding
    formula ``16·(⌊len/16⌋+1)`` (ECB has no IV, so output bytes are
    deterministic too — the length pins that the real cipher ran, not a
    pass-through). Both AES exprs are JVM codegen'd; zero UDF/shuffle."""
    from logstash_spark.functions import cipher

    key = "0123456789abcdef"
    ev = _ev(spark, sf_dir).select(
        "event_id",
        F.concat(
            F.lit("msg-"),
            F.col("event_type"),
            F.lit("-"),
            (F.col("event_id") % 1000).cast("string"),
        ).alias("plain"),
    )
    enc = cipher(
        ev, "plain", key=key, mode="encrypt",
        algorithm="AES-ECB-PKCS", target="ct",
    )
    dec = cipher(
        enc, "ct", key=key, mode="decrypt",
        algorithm="AES-ECB-PKCS", target="plain_rt",
    )
    return dec.select(
        "event_id",
        "plain_rt",
        F.octet_length(F.unbase64(F.col("ct"))).cast("long").alias("ct_len"),
    )


# ---------------------------------------------------------------------------
# json_encode (logstash-filter-json_encode)
# ---------------------------------------------------------------------------


@query(
    "json_encode_field",
    """
    SELECT event_id,
           '{"event_type":"' || event_type || '","user_id":'
               || CAST(user_id AS VARCHAR) || '}' AS j,
           '{"value":' || CAST(event_id % 97 AS VARCHAR) || '}' AS js
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
    """,
)
def json_encode_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_encode both forms (reference: logstash-filter-json_encode):
    a multi-column object in declared field order, and a scalar wrapped
    as a one-key object. Spark `to_json` emits compact JSON with struct
    field order — byte-identical to the oracle's string concatenation
    (values here need no JSON escaping by construction)."""
    from logstash_spark.operators.parse import json_encode

    ev = (
        _ev(spark, sf_dir)
        .where(F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
        .withColumn("value", (F.col("event_id") % 97))
    )
    out = json_encode(ev, ["event_type", "user_id"], target="j")
    out = json_encode(out, "value", target="js")
    return out.select("event_id", "j", "js")

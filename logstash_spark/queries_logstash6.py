"""Correctness-gate queries, batch 6 (round 3): json_lines / graphite /
es_bulk codecs, anonymize digests, and the HAPROXYHTTPBASE grok stock
pattern. Same parity discipline as the other batches: all synthesized
inputs derive deterministically from the events table, column names and
types align with the DuckDB oracle, no raw arrays in the SELECT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# json_lines codec
# ---------------------------------------------------------------------------


@query(
    "json_lines_codec",
    """
    SELECT event_id, 0 AS line_no,
           CAST(event_id % 100 AS INT) AS a, event_type AS b,
           0 AS failed, CAST(NULL AS VARCHAR) AS raw_line
    FROM events
    UNION ALL
    SELECT event_id, 1, CAST(user_id % 50 AS INT), 'x', 0, NULL FROM events
    UNION ALL
    SELECT event_id, 2, NULL, NULL, 1, 'not json at all'
    FROM events WHERE event_id % 53 = 0
    """,
)
def json_lines_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-codec-json_lines decode: an NDJSON blob splits into one
    event per line with schema'd top-level fields; a corrupt line (every
    53rd blob carries one) still yields an event, tagged
    ``_jsonparsefailure`` with the raw text preserved — detected via the
    PERMISSIVE corrupt-record channel, not struct-nullness."""
    from logstash_spark.operators.codec import json_lines_decode

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    l0 = F.concat(
        F.lit('{"a":'), (eid % 100).cast("string"),
        F.lit(',"b":"'), F.col("event_type"), F.lit('"}'),
    )
    l1 = F.concat(
        F.lit('{"a":'), (F.col("user_id") % 50).cast("string"), F.lit(',"b":"x"}')
    )
    blob = F.when(
        eid % 53 == 0,
        F.concat_ws("\n", l0, l1, F.lit("not json at all")),
    ).otherwise(F.concat_ws("\n", l0, l1))
    out = json_lines_decode(
        ev.withColumn("blob", blob).select("event_id", "blob"),
        "blob",
        "a INT, b STRING",
    )
    return out.select(
        "event_id",
        "line_no",
        "a",
        "b",
        F.array_contains("tags", "_jsonparsefailure").cast("int").alias("failed"),
        "raw_line",
    )


# ---------------------------------------------------------------------------
# graphite codec (decode + encode round trip)
# ---------------------------------------------------------------------------


@query(
    "graphite_codec",
    """
    SELECT event_id,
           CASE WHEN event_id % 53 = 0 THEN NULL
                ELSE 'srv.' || event_type || '.cpu' END AS metric,
           CASE WHEN event_id % 53 = 0 THEN NULL
                ELSE CAST(event_id % 1000 AS DOUBLE) END AS value,
           CASE WHEN event_id % 53 = 0 THEN NULL
                ELSE CAST(1700000000 + event_id % 86400 AS BIGINT) END AS epoch,
           CASE WHEN event_id % 53 = 0 THEN 1 ELSE 0 END AS failed,
           CASE WHEN event_id % 53 = 0 THEN NULL
                ELSE 'srv.' || event_type || '.cpu ' || CAST(event_id % 1000 AS VARCHAR)
                     || ' ' || CAST(1700000000 + event_id % 86400 AS VARCHAR)
           END AS reencoded
    FROM events
    """,
)
def graphite_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-codec-graphite both directions: decode ``metric value
    timestamp`` plaintext lines (malformed every 53rd event →
    ``_graphiteparsefailure``, null columns), then re-encode the decoded
    rows and confirm the round trip is byte-identical to the original
    line. Epoch is compared as integer seconds (cross-engine timestamp
    hashing avoided by design)."""
    from logstash_spark.operators.codec import graphite_decode, graphite_encode

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    line = F.concat_ws(
        " ",
        F.concat(F.lit("srv."), F.col("event_type"), F.lit(".cpu")),
        (eid % 1000).cast("string"),
        (F.lit(1700000000) + eid % 86400).cast("string"),
    )
    blob = F.when(eid % 53 == 0, F.lit("oops malformed line")).otherwise(line)
    dec = graphite_decode(
        ev.withColumn("message", blob).select("event_id", "message"), "message"
    )
    enc = graphite_encode(dec.where(F.col("metric").isNotNull()))
    dec = dec.join(
        enc.select("event_id", F.col("message").alias("reencoded")),
        "event_id",
        "left",
    )
    return dec.select(
        "event_id",
        "metric",
        "value",
        F.unix_timestamp("ts").alias("epoch"),
        F.array_contains("tags", "_graphiteparsefailure").cast("int").alias("failed"),
        "reencoded",
    )


# ---------------------------------------------------------------------------
# es_bulk codec
# ---------------------------------------------------------------------------


@query(
    "es_bulk_codec",
    """
    SELECT event_id, 0 AS line_no, 'index' AS action,
           'logs-' || event_type AS bulk_index,
           CAST(event_id AS VARCHAR) AS bulk_id,
           '{"v":' || CAST(user_id AS VARCHAR) || '}' AS source,
           CAST(user_id AS BIGINT) AS v
    FROM events
    UNION ALL
    SELECT event_id, 2, 'delete', 'old', CAST(event_id % 7 AS VARCHAR),
           NULL, NULL
    FROM events
    """,
)
def es_bulk_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-codec-es_bulk decode: an ES bulk-API NDJSON body with an
    ``index`` action + source doc followed by a sourceless ``delete``
    action, paired relationally (lead over line order within each
    request blob — one window shuffle keyed on the request id). The
    source doc round-trips through get_json_object to prove it is the
    untouched raw line."""
    from logstash_spark.operators.codec import es_bulk_decode

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    body = F.concat_ws(
        "\n",
        F.concat(
            F.lit('{"index":{"_index":"logs-'), F.col("event_type"),
            F.lit('","_id":"'), eid.cast("string"), F.lit('"}}'),
        ),
        F.concat(F.lit('{"v":'), F.col("user_id").cast("string"), F.lit("}")),
        F.concat(
            F.lit('{"delete":{"_index":"old","_id":"'),
            (eid % 7).cast("string"), F.lit('"}}'),
        ),
    )
    out = es_bulk_decode(
        ev.withColumn("body", body).select("event_id", "body"),
        "body",
        group_by=["event_id"],
    )
    return out.select(
        "event_id",
        "line_no",
        "action",
        "bulk_index",
        "bulk_id",
        "source",
        F.get_json_object("source", "$.v").cast("long").alias("v"),
    )


# ---------------------------------------------------------------------------
# anonymize
# ---------------------------------------------------------------------------


@query(
    "anonymize_fields",
    """
    SELECT event_id,
           sha256(event_type) AS event_type,
           md5(CAST(user_id AS VARCHAR)) AS user_md5
    FROM events
    """,
)
def anonymize_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-anonymize: fields overwritten in place with their
    hex digests (SHA256 + MD5 here; SHA1 and the keyed OpenSSL-HMAC
    path are pinned against Python's hmac module in unit tests — DuckDB
    lacks sha1/hmac)."""
    from logstash_spark.functions import anonymize

    ev = _ev(spark, sf_dir).withColumn("user_md5", F.col("user_id"))
    out = anonymize(ev, ["event_type"], algorithm="SHA256")
    out = anonymize(out, ["user_md5"], algorithm="MD5")
    return out.select("event_id", "event_type", "user_md5")


# ---------------------------------------------------------------------------
# grok HAPROXYHTTPBASE
# ---------------------------------------------------------------------------


@query(
    "grok_haproxy",
    """
    SELECT event_id,
           '10.' || CAST(user_id % 200 AS VARCHAR) || '.'
                 || CAST(event_id % 250 AS VARCHAR) || '.1' AS client_ip,
           CAST(1024 + event_id % 60000 AS INT) AS client_port,
           '17/Aug/2026:10:11:' || lpad(CAST(event_id % 60 AS VARCHAR), 2, '0')
               || '.345' AS accept_date,
           'fe-main' AS frontend_name,
           'be-app' AS backend_name,
           'srv' || CAST(event_id % 8 AS VARCHAR) AS server_name,
           CAST(event_id % 50 AS INT) AS time_request,
           CAST(event_id % 20 AS INT) AS time_queue,
           CAST(event_id % 30 AS INT) AS time_backend_connect,
           CAST(event_id % 400 AS INT) AS time_backend_response,
           CAST(CASE event_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 301
                                  WHEN 2 THEN 404 ELSE 503 END AS INT)
               AS http_status_code,
           CAST(event_id % 100000 AS VARCHAR) AS bytes_read,
           '----' AS termination_state,
           CAST(event_id % 100 AS INT) AS actconn,
           CAST(event_id % 64 AS INT) AS srv_queue,
           CASE WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END AS http_verb,
           '/api/v1/item/' || CAST(event_id % 5000 AS VARCHAR) AS http_request,
           '1.1' AS http_version
    FROM events
    """,
)
def grok_haproxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAPROXYHTTPBASE stock pattern (logstash-patterns-core
    patterns/legacy/haproxy, behavioral rewrite in grok.py): full
    HTTP-mode access line — client ip:port, accept date, fe/be/server
    names, the Tq/Tw/Tc/Tr timer block, status, byte count, termination
    state, the conn-count block, queue block, and the quoted request
    (verb + path + HTTP version) — all typed via in-pattern :int casts."""
    from logstash_spark.operators.parse import grok

    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    status = (
        F.when(eid % 4 == 0, 200).when(eid % 4 == 1, 301)
        .when(eid % 4 == 2, 404).otherwise(503)
    )
    line = F.concat(
        F.format_string("10.%d.%d.1:", uid % 200, eid % 250),
        (F.lit(1024) + eid % 60000).cast("string"),
        F.lit(" [17/Aug/2026:10:11:"),
        F.lpad((eid % 60).cast("string"), 2, "0"),
        F.lit(".345] fe-main be-app/srv"),
        (eid % 8).cast("string"),
        F.lit(" "),
        F.concat_ws(
            "/",
            (eid % 50).cast("string"), (eid % 20).cast("string"),
            (eid % 30).cast("string"), (eid % 400).cast("string"),
            (eid % 500).cast("string"),
        ),
        F.lit(" "),
        status.cast("string"),
        F.lit(" "),
        (eid % 100000).cast("string"),
        F.lit(" - - ---- "),
        F.concat_ws(
            "/",
            (eid % 100).cast("string"), (eid % 200).cast("string"),
            (eid % 150).cast("string"), (eid % 50).cast("string"),
            F.lit("0"),
        ),
        F.lit(" "),
        F.concat_ws("/", (eid % 64).cast("string"), (eid % 16).cast("string")),
        F.lit(' "'),
        F.when(eid % 2 == 0, F.lit("GET")).otherwise(F.lit("POST")),
        F.lit(" /api/v1/item/"),
        (eid % 5000).cast("string"),
        F.lit(' HTTP/1.1"'),
    )
    df = ev.withColumn("message", line).select("event_id", "message")
    out = grok(df, "message", r"^%{HAPROXYHTTPBASE}$")
    return out.select(
        "event_id",
        "client_ip",
        "client_port",
        "accept_date",
        "frontend_name",
        "backend_name",
        "server_name",
        "time_request",
        "time_queue",
        "time_backend_connect",
        "time_backend_response",
        "http_status_code",
        "bytes_read",
        "termination_state",
        "actconn",
        "srv_queue",
        "http_verb",
        "http_request",
        "http_version",
    )

"""Correctness-gate queries, batch 4 (round 3): grok stock-pattern
breadth (COMBINEDAPACHELOG, RFC5424 syslog), nested-field mutate writes,
simhash candidate pairs with the hot-bucket star guard, DLQ replay,
kv option surface, multiline guards, and geoip attribute enrichment.

Each Spark query runs the real operator; each oracle re-derives the
result in DuckDB ANSI SQL from the same deterministic synthesis (the
driver hash-compares values after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import mutate as M
from logstash_spark.operators.parse import grok
from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# Grok stock-pattern breadth (logstash-patterns-core parity additions)
# ---------------------------------------------------------------------------


@query(
    "grok_apache_combined",
    """
    SELECT event_id,
           '10.' || CAST(user_id % 200 AS VARCHAR) || '.'
                 || CAST(event_id % 250 AS VARCHAR) || '.'
                 || CAST(event_id % 50 + 1 AS VARCHAR) AS clientip,
           'user' || CAST(user_id AS VARCHAR) AS auth,
           '05/Oct/2023:10:11:12 +0000' AS tstamp,
           CASE WHEN event_id % 2 = 0 THEN 'GET' ELSE 'POST' END AS verb,
           '/api/items/' || CAST(event_id AS VARCHAR) AS request,
           '1.1' AS httpversion,
           CAST(CASE WHEN event_id % 5 = 0 THEN 404 ELSE 200 END AS INT) AS response,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE CAST(event_id % 9000 + 100 AS INT) END AS bytes,
           '"http://ref.example/p"' AS referrer,
           '"Mozilla/5.0 (X11; Linux x86_64)"' AS agent
    FROM events
    """,
)
def grok_apache_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """%{COMBINEDAPACHELOG} end-to-end over a synthesized access log
    (reference: logstash-patterns-core grok-patterns + logstash-filter-grok
    spec apache goldens): clientip/auth/timestamp/verb/request/httpversion,
    response:int, bytes:int with the `-` (no bytes) branch → null, quoted
    referrer/agent captured with quotes (QS semantics)."""
    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    ip = F.format_string(
        "10.%d.%d.%d", uid % 200, eid % 250, eid % 50 + 1
    )
    verb = F.when(eid % 2 == 0, F.lit("GET")).otherwise(F.lit("POST"))
    resp = F.when(eid % 5 == 0, F.lit(404)).otherwise(F.lit(200))
    bytes_s = F.when(eid % 7 == 0, F.lit("-")).otherwise(
        (eid % 9000 + 100).cast("string")
    )
    line = F.concat(
        ip, F.lit(" - user"), uid.cast("string"),
        F.lit(' [05/Oct/2023:10:11:12 +0000] "'), verb,
        F.lit(" /api/items/"), eid.cast("string"),
        F.lit(' HTTP/1.1" '), resp.cast("string"), F.lit(" "), bytes_s,
        F.lit(' "http://ref.example/p" "Mozilla/5.0 (X11; Linux x86_64)"'),
    )
    g = grok(ev.withColumn("message", line), "message", "%{COMBINEDAPACHELOG}")
    return g.select(
        "event_id", "clientip", "auth", F.col("timestamp").alias("tstamp"),
        "verb", "request", "httpversion", "response", "bytes",
        "referrer", "agent",
    )


@query(
    "grok_syslog5424",
    """
    SELECT event_id,
           '1' AS ver,
           '2023-10-05T10:11:12.345Z' AS ts5424,
           'host' || CAST(user_id % 50 AS VARCHAR) || '.example.com' AS host,
           event_type AS app,
           CASE WHEN event_id % 3 = 0 THEN NULL
                ELSE CAST(user_id + 100 AS VARCHAR) END AS proc,
           CASE WHEN event_id % 4 = 0 THEN NULL
                ELSE 'MSG' || CAST(event_id % 1000 AS VARCHAR) END AS msgid,
           CASE WHEN event_id % 6 = 0 THEN NULL
                ELSE '[ex@32473 iut="3" eid="' || CAST(event_id AS VARCHAR) || '"]'
           END AS sd,
           'User action recorded eid=' || CAST(event_id AS VARCHAR) AS msg
    FROM events
    """,
)
def grok_syslog5424(spark: SparkSession, sf_dir: str) -> DataFrame:
    """%{SYSLOG5424LINE} (RFC5424 structured syslog) over synthesized
    lines: PRI/version header, ISO8601 timestamp, nil (`-`) handling for
    procid/msgid/structured-data → null captures, SD block captured
    verbatim, free-form message tail."""
    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    host = F.format_string("host%d.example.com", uid % 50)
    proc = F.when(eid % 3 == 0, F.lit("-")).otherwise((uid + 100).cast("string"))
    msgid = F.when(eid % 4 == 0, F.lit("-")).otherwise(
        F.concat(F.lit("MSG"), (eid % 1000).cast("string"))
    )
    sd = F.when(eid % 6 == 0, F.lit("-")).otherwise(
        F.concat(
            F.lit('[ex@32473 iut="3" eid="'), eid.cast("string"), F.lit('"]')
        )
    )
    line = F.concat(
        F.lit("<165>1 2023-10-05T10:11:12.345Z "), host, F.lit(" "),
        F.col("event_type"), F.lit(" "), proc, F.lit(" "), msgid, F.lit(" "),
        sd, F.lit(" User action recorded eid="), eid.cast("string"),
    )
    g = grok(ev.withColumn("line", line), "line", "%{SYSLOG5424LINE}")
    return g.select(
        "event_id",
        F.col("syslog5424_ver").alias("ver"),
        F.col("syslog5424_ts").alias("ts5424"),
        F.col("syslog5424_host").alias("host"),
        F.col("syslog5424_app").alias("app"),
        F.col("syslog5424_proc").alias("proc"),
        F.col("syslog5424_msgid").alias("msgid"),
        F.col("syslog5424_sd").alias("sd"),
        F.col("syslog5424_msg").alias("msg"),
    )


# ---------------------------------------------------------------------------
# Nested-field write surface (Event.java §setField / FieldReference.java)
# ---------------------------------------------------------------------------


@query(
    "mutate_nested_fields",
    """
    SELECT event_id,
           event_type AS evt_type,
           'sf' AS evt_env,
           'type=' || event_type AS evt_label,
           CAST(user_id AS VARCHAR) AS evt_user,
           event_type AS flat_type
    FROM events
    """,
)
def mutate_nested_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip through a nested struct: rename a scalar INTO
    `[evt][type]`, add_field/copy nested targets, rename a nested entry
    back OUT to a flat column, then flatten for the oracle (the driver
    comparator hashes scalars)."""
    ev = _ev(spark, sf_dir)
    df = M.rename(ev, {"event_type": "[evt][type]"})
    df = M.add_field(df, {"[evt][env]": "sf", "[evt][label]": "type=%{[evt][type]}"})
    df = M.copy(df, {"user_id": "[evt][user]"})
    df = M.rename(df, {"[evt][type]": "flat_type"})
    df = M.copy(df, {"flat_type": "[evt][type]"})  # write back in
    return df.select(
        "event_id",
        F.col("evt.type").alias("evt_type"),
        F.col("evt.env").alias("evt_env"),
        F.col("evt.label").alias("evt_label"),
        F.col("evt.user").cast("string").alias("evt_user"),
        "flat_type",
    )

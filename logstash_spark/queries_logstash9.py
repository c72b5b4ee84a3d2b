"""Correctness-gate queries, batch 9 (round 3): the late-round grok
stock-pattern families — cisco ASA firewall, nagios core log, and linux
PAM session lines — parsed through ONE grok pattern list (first-match
break_on_match semantics across three families). Inputs synthesize
deterministically from the events table; the DuckDB oracle recomputes
every captured field with the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# grok: cisco ASA + nagios + pam session via one pattern list
# ---------------------------------------------------------------------------


@query(
    "grok_firewall_families",
    """
    WITH base AS (
      SELECT event_id AS eid, user_id AS uid FROM events
    )
    SELECT eid AS event_id,
           -- cisco rows (eid % 3 = 0)
           CASE WHEN eid % 3 = 0 THEN
                CASE WHEN eid % 2 = 0 THEN 'Built' ELSE 'Teardown' END
           END AS action,
           CASE WHEN eid % 3 = 0 AND eid % 2 = 0 THEN 'inbound' END AS direction,
           CASE WHEN eid % 3 = 0 THEN
                CASE WHEN eid % 5 = 0 THEN 'UDP' ELSE 'TCP' END
           END AS protocol,
           CASE WHEN eid % 3 = 0 THEN CAST(eid % 100000 AS INT) END
               AS connection_id,
           CASE WHEN eid % 3 = 0 THEN
                '192.168.' || CAST(uid % 200 AS VARCHAR) || '.'
                           || CAST(eid % 250 AS VARCHAR)
           END AS src_ip,
           CASE WHEN eid % 3 = 0 THEN CAST(1024 + eid % 60000 AS INT) END
               AS src_port,
           CASE WHEN eid % 3 = 0 THEN CAST(443 AS INT) END AS dst_port,
           CASE WHEN eid % 3 = 0 AND eid % 2 = 1
                THEN CAST(eid % 100000 AS INT) END AS bytes,
           -- nagios rows (eid % 3 = 1)
           CASE WHEN eid % 3 = 1 THEN 'host-' || CAST(uid % 50 AS VARCHAR) END
               AS nagios_hostname,
           CASE WHEN eid % 3 = 1 THEN
                CASE uid % 3 WHEN 0 THEN 'CRITICAL' WHEN 1 THEN 'WARNING'
                             ELSE 'OK' END
           END AS nagios_state,
           CASE WHEN eid % 3 = 1 THEN CAST(1 + eid % 5 AS INT) END
               AS nagios_attempt,
           CASE WHEN eid % 3 = 1 THEN 'check output ' || CAST(eid AS VARCHAR) END
               AS nagios_message,
           -- pam rows (eid % 3 = 2)
           CASE WHEN eid % 3 = 2 THEN 'sshd' END AS program,
           CASE WHEN eid % 3 = 2 THEN
                CASE WHEN eid % 2 = 0 THEN 'opened' ELSE 'closed' END
           END AS pam_session_state,
           CASE WHEN eid % 3 = 2 THEN 'user' || CAST(uid % 100 AS VARCHAR) END
               AS username,
           CASE WHEN eid % 3 = 2 AND eid % 2 = 0 THEN '(uid=0)' END AS pam_by
    FROM base
    """,
)
def grok_firewall_families(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three stock-pattern families through one grok pattern list
    (reference: logstash-patterns-core patterns/legacy/{firewalls,
    nagios,linux-syslog}, behavioral rewrites in grok.py; first-match
    break_on_match per logstash-filter-grok §match):

    * CISCOFW302013_302014_302015_302016 — ASA Built/Teardown connection
      lines, with the optional direction / duration+bytes tails;
    * NAGIOSLOGLINE — SERVICE ALERT branch of the alternation;
    * SYSLOGPAMSESSION — pam_unix session open/close with optional `by`.

    All captures are scalars (:int casts inside the patterns); the three
    families partition the corpus on event_id % 3 so the oracle can
    recompute every field exactly.
    """
    from logstash_spark.operators.parse import grok

    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")

    proto = F.when(eid % 5 == 0, "UDP").otherwise("TCP")
    cisco = F.concat(
        F.when(eid % 2 == 0, F.lit("Built inbound ")).otherwise(F.lit("Teardown ")),
        proto,
        F.lit(" connection "),
        (eid % 100000).cast("string"),
        F.format_string(" for outside:192.168.%d.%d/", uid % 200, eid % 250),
        (F.lit(1024) + eid % 60000).cast("string"),
        F.format_string(" to inside:10.0.%d.%d/443", uid % 100, eid % 200),
        F.when(
            eid % 2 == 1,
            F.concat(
                F.lit(" duration 0:00:"),
                F.lpad((eid % 60).cast("string"), 2, "0"),
                F.lit(" bytes "),
                (eid % 100000).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    nagios_state = (
        F.when(uid % 3 == 0, "CRITICAL").when(uid % 3 == 1, "WARNING").otherwise("OK")
    )
    nagios = F.concat(
        F.lit("[14721213"),
        F.lpad((eid % 100).cast("string"), 2, "0"),
        F.lit("] SERVICE ALERT: host-"),
        (uid % 50).cast("string"),
        F.lit(";http;"),
        nagios_state,
        F.lit(";HARD;"),
        (F.lit(1) + eid % 5).cast("string"),
        F.lit(";check output "),
        eid.cast("string"),
    )
    pam = F.concat(
        F.lit("Aug 17 10:00:01 web-"),
        (uid % 20).cast("string"),
        F.lit(" sshd["),
        (eid % 30000).cast("string"),
        F.lit("]: pam_unix(sshd:session): session "),
        F.when(eid % 2 == 0, F.lit("opened")).otherwise(F.lit("closed")),
        F.lit(" for user user"),
        (uid % 100).cast("string"),
        F.when(eid % 2 == 0, F.lit(" by (uid=0)")).otherwise(F.lit("")),
    )
    line = (
        F.when(eid % 3 == 0, cisco).when(eid % 3 == 1, nagios).otherwise(pam)
    )
    df = ev.select("event_id", "user_id", line.alias("message"))
    out = grok(
        df,
        "message",
        [
            "%{CISCOFW302013_302014_302015_302016}",
            "%{NAGIOSLOGLINE}",
            "%{SYSLOGPAMSESSION}",
        ],
    )
    return out.select(
        "event_id",
        "action",
        "direction",
        "protocol",
        F.col("connection_id").cast("int").alias("connection_id"),
        "src_ip",
        F.col("src_port").cast("int").alias("src_port"),
        F.col("dst_port").cast("int").alias("dst_port"),
        F.col("bytes").cast("int").alias("bytes"),
        "nagios_hostname",
        "nagios_state",
        F.col("nagios_attempt").cast("int").alias("nagios_attempt"),
        "nagios_message",
        "program",
        "pam_session_state",
        "username",
        "pam_by",
    )


@query(
    "streaming_metrics_windows",
    """
    SELECT strftime(make_timestamp(epoch_us(ts) // 300000000 * 300000000),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(make_timestamp(epoch_us(ts) // 300000000 * 300000000
                                   + 300000000),
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_metrics_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCTURED STREAMING gate: the events table replayed through a
    real `readStream` file source into `streaming.streaming_metrics`
    (watermarked 5-minute tumbling counts by event_type), drained with
    trigger availableNow into a memory sink, returned as the batch
    result. With the full table available the watermark drops nothing,
    so the incremental answer must equal the batch GROUP BY — which is
    exactly what the oracle computes (Spark window() aligns to the unix
    epoch; the oracle mirrors it with integer epoch arithmetic). This
    puts the streaming runtime itself — source, state store, window
    eviction, sink — under the driver's cross-engine gate, not just
    unit tests."""
    from logstash_spark.streaming.pipeline import (  # noqa: PLC0415
        drain_available_now,
        replay_table_stream,
        streaming_metrics,
    )

    src = replay_table_stream(spark, sf_dir, "events", ts_col="ts")
    agg = streaming_metrics(
        src, "ts", ["event_type"], window_duration="5 minutes",
        watermark="10 minutes",
    )
    return drain_available_now(agg, output_mode="complete").select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "cnt",
    )

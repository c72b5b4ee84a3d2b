"""Correctness-gate queries, batch 7 (round 3): output-side codecs —
logstash-output-csv, logstash-output-syslog (RFC3164 line rendering),
logstash-output-statsd wire format. Transport (TCP/UDP sockets) is out
of scope per SURVEY §7.4; the serialization IS the reference behavior
being matched. Parity discipline as usual: deterministic inputs derived
from the events table, engine-identical string construction, no raw
arrays in the SELECT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# extractnumbers + math + i18n transliterate — one gate, three filters
# ---------------------------------------------------------------------------


@query(
    "extract_math_translit",
    """
    SELECT event_id,
           CAST(event_id % 1000 AS BIGINT) AS int0,
           CAST(-(event_id % 10) AS BIGINT) AS int1,
           CAST(event_id % 50 AS DOUBLE) + 0.25 AS float0,
           2 AS n_ints,
           1 AS n_floats,
           event_id + user_id AS m_add,
           user_id * 3 AS m_mul,
           (event_id + user_id) / 4.0 AS m_div,
           round((event_id + user_id) / 4.0, 0) AS m_round,
           CAST(floor(event_id / 7) AS BIGINT) AS m_fdiv,
           event_id % 9 AS m_mod,
           'cafe ' || event_type || ' AEIOU ss-ae-oe Z' AS ascii_text
    FROM events
    """,
)
def extract_math_translit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-extractnumbers + logstash-filter-math +
    logstash-filter-i18n (transliterate), folded into one driver-sample
    slot. The oracle derives every expected value INDEPENDENTLY from
    event_id arithmetic rather than replaying the extraction — a
    stronger check than mirrored machinery. Number extraction covers
    signed ints and decimals in one message; math covers
    add/mul/div/round/fdiv/mod with a chained operand (m_div reads
    m_add, reference in-order semantics); transliterate folds the fixed
    public accent table including the multi-char ß/æ/œ expansions."""
    from logstash_spark.functions import extractnumbers, math_ops, transliterate

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    msg = F.concat(
        F.lit("pid="), (eid % 1000).cast("string"),
        F.lit(" load="), (eid % 50).cast("string"),
        F.lit(".25 t=-"), (eid % 10).cast("string"),
    )
    df = ev.withColumn("message", msg)
    df = extractnumbers(df, "message", max_fields=2)
    df = math_ops(
        df,
        [
            ("add", "event_id", "user_id", "m_add"),
            ("mul", "user_id", 3, "m_mul"),
            ("div", "m_add", 4.0, "m_div"),
            ("round", "m_div", 0, "m_round"),
            ("fdiv", "event_id", 7, "m_fdiv"),
            ("mod", "event_id", 9, "m_mod"),
        ],
    )
    df = df.withColumn(
        "accented",
        F.concat(F.lit("café "), F.col("event_type"), F.lit(" ÀÉÎÕÜ ß-æ-œ Ž")),
    )
    df = transliterate(df, "accented", target="ascii_text")
    return df.select(
        "event_id",
        "int0",
        "int1",
        "float0",
        F.size("_ints").alias("n_ints"),
        F.size("_floats").alias("n_floats"),
        "m_add",
        "m_mul",
        "m_div",
        "m_round",
        "m_fdiv",
        "m_mod",
        "ascii_text",
    )


# ---------------------------------------------------------------------------
# date filter: per-event timezone (sprintf)
# ---------------------------------------------------------------------------


@query(
    "date_tz_per_event",
    """
    SELECT event_id,
           CASE event_id % 3 WHEN 0 THEN '+02:00'
                             WHEN 1 THEN '-05:00'
                             ELSE '+00:00' END AS tzf,
           CAST(floor(epoch(ts)) AS BIGINT)
             - CASE event_id % 3 WHEN 0 THEN 7200
                                 WHEN 1 THEN -18000
                                 ELSE 0 END AS epoch_utc
    FROM events
    """,
)
def date_tz_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-date `timezone => "%{tzf}"` — a sprintf per-event
    zone: the wall-clock string is re-interpreted in each row's own
    zone before normalizing to UTC (`to_utc_timestamp` with a COLUMN
    tz). The oracle derives expected epochs independently by interval
    arithmetic over fixed offsets (utc = local − offset), so no
    timezone machinery has to agree across engines."""
    from logstash_spark.operators.parse import date as date_op

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    tzf = (
        F.when(eid % 3 == 0, F.lit("+02:00"))
        .when(eid % 3 == 1, F.lit("-05:00"))
        .otherwise(F.lit("+00:00"))
    )
    df = ev.select(
        "event_id",
        tzf.alias("tzf"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("dstr"),
    )
    out = date_op(
        df, "dstr", ["yyyy-MM-dd HH:mm:ss"], timezone="%{tzf}", target="parsed"
    )
    return out.select(
        "event_id", "tzf", F.unix_timestamp("parsed").alias("epoch_utc")
    )


# ---------------------------------------------------------------------------
# csv output codec
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# syslog (RFC3164) + statsd output codecs — one gate, two wire formats
# ---------------------------------------------------------------------------


@query(
    "syslog_statsd_encode",
    """
    SELECT event_id,
           '<' || CAST(32 + event_id % 8 AS VARCHAR) || '>'
               || strftime(ts, '%b %d %H:%M:%S') || ' '
               || 'h' || CAST(event_id % 20 AS VARCHAR)
               || ' app[' || CAST(user_id AS VARCHAR) || ']: '
               || event_type AS syslog_line,
           'ls.' || 'h' || CAST(event_id % 20 AS VARCHAR) || '.events:'
               || CASE WHEN event_id % 2 = 0
                       THEN CAST(event_id % 100 AS VARCHAR)
                       ELSE CAST(event_id % 100 AS VARCHAR) || '.5' END
               || '|c|@0.5' AS statsd_line,
           CAST(event_id AS VARCHAR) || ',' || event_type || ',' ||
           CASE
             WHEN event_id % 13 = 0 THEN '"say ""hi"" now"'
             WHEN event_id % 7 = 0
               THEN '"v=' || CAST(event_id % 50 AS VARCHAR) || ',raw"'
             ELSE 'plain-' || CAST(event_id % 50 AS VARCHAR)
           END AS csv_line
    FROM events
    """,
)
def syslog_statsd_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-output-syslog + logstash-output-statsd +
    logstash-output-csv serialization in one gate (three independent
    pure-projection columns; csv folded in from the former standalone
    `csv_codec_encode` per the r03 verdict's gate-budget advice).
    Syslog: ``<PRI>`` from facility*8+severity (severity a
    per-row column here), RFC3164 header with English month
    abbreviation, ``program[pid]:`` tag. Statsd: counter lines with the
    integral/fractional value rendering and a ``|@rate`` suffix; the
    fractional case uses a dyadic-rational (.5) so double→string agrees
    across engines. CSV: native ``to_csv`` RFC-4180 rendering whose
    crafted ``note`` field exercises all three quoting regimes —
    embedded separator (quoted), embedded double-quote (quoted +
    doubled), plain (bare) — vs an oracle building the quoting by hand."""
    from logstash_spark.operators.codec import (
        csv_encode,
        statsd_encode,
        syslog_encode,
    )

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    df = (
        ev.withColumn("sev", (eid % 8).cast("int"))
        .withColumn("host", F.concat(F.lit("h"), (eid % 20).cast("string")))
        .withColumn(
            "value",
            F.when(eid % 2 == 0, (eid % 100).cast("double")).otherwise(
                (eid % 100).cast("double") + 0.5
            ),
        )
        .withColumn("metric", F.lit("events"))
    )
    out = syslog_encode(
        df,
        facility=4,
        severity_col="sev",
        ts_col="ts",
        host_col="host",
        program="app",
        pid_col="user_id",
        message_col="event_type",
        target="syslog_line",
    )
    out = statsd_encode(
        out,
        namespace="ls",
        sender_col="host",
        metric_col="metric",
        value_col="value",
        metric_type="c",
        sample_rate=0.5,
        target="statsd_line",
    )
    note = (
        F.when(eid % 13 == 0, F.lit('say "hi" now'))
        .when(eid % 7 == 0,
              F.concat(F.lit("v="), (eid % 50).cast("string"), F.lit(",raw")))
        .otherwise(F.concat(F.lit("plain-"), (eid % 50).cast("string")))
    )
    out = csv_encode(
        out.withColumn("note", note),
        ["event_id", "event_type", "note"],
        target="csv_line",
    )
    return out.select("event_id", "syslog_line", "statsd_line", "csv_line")

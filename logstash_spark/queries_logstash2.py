"""Correctness-gate queries, batch 2: the remaining Logstash operator
surface — multiplicity (clone/split/drop), codecs (csv/multiline),
network filters (cidr/geoip/useragent/syslog_pri/urldecode), sprintf,
mutate convert matrix, fingerprint, sessionization, cardinality metrics.

Inputs are synthesized deterministically from the driver test tables so
both engines see identical data (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators import mutate as M
from logstash_spark.operators.aggregate import sessionize
from logstash_spark.operators.codec import multiline
from logstash_spark.operators.dataprep import portable_hash32
from logstash_spark.operators.enrich import cidr, geoip_range_join, static_lookup_df
from logstash_spark.operators.multiplicity import clone, drop_events, split_events
from logstash_spark.operators.parse import csv_filter, syslog_pri, useragent
from logstash_spark.operators.common import sprintf
from logstash_spark.functions import fingerprint, range_tag
from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


# ---------------------------------------------------------------------------
# Multiplicity
# ---------------------------------------------------------------------------


@query(
    "clone_multiply",
    """
    SELECT type, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest([NULL, 'audit', 'archive']) AS type FROM events)
    GROUP BY type
    """,
)
def clone_multiply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-clone: original + one copy per type (3x rows)."""
    ev = _ev(spark, sf_dir)
    return clone(ev, ["audit", "archive"]).groupBy("type").agg(F.count("*").alias("cnt"))


@query(
    "split_explode",
    """
    SELECT word, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-split: one event per array element (explode)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.withColumn("word", F.split(F.col("text"), " "))
    return split_events(df, "word").groupBy("word").agg(F.count("*").alias("cnt"))


@query(
    "drop_sampled",
    """
    SELECT CAST(count(*) AS BIGINT) AS kept
    FROM events
    WHERE NOT (event_type = 'click'
               AND CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 80)
    """,
)
def drop_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-drop with percentage: deterministically drop 80% of
    'click' events (hash sampling, never rand())."""
    ev = _ev(spark, sf_dir)
    out = drop_events(
        ev,
        F.col("event_type") == "click",
        percentage=80,
        key="event_id",
        hash_fn=portable_hash32,
    )
    return out.agg(F.count("*").alias("kept"))


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------


@query(
    "csv_codec",
    """
    SELECT event_id,
           split_part(line, ';', 1) AS etype,
           CAST(split_part(line, ';', 2) AS BIGINT) AS uid,
           CAST(split_part(line, ';', 3) AS DOUBLE) AS val
    FROM (SELECT event_id,
                 event_type || ';' || CAST(user_id AS VARCHAR) || ';' ||
                 CAST(round(value, 2) AS VARCHAR) AS line
          FROM events)
    """,
)
def csv_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-codec-csv / filter-csv: delimited line → typed columns."""
    ev = _ev(spark, sf_dir)
    line = F.concat_ws(
        ";",
        F.col("event_type"),
        F.col("user_id").cast("string"),
        F.round(F.col("value"), 2).cast("string"),
    )
    df = ev.withColumn("line", line)
    out = csv_filter(
        df, "line", ["etype", "uid", "val"], separator=";",
        types={"uid": "bigint", "val": "double"},
    )
    return out.select("event_id", "etype", "uid", "val")


@query(
    "multiline_codec",
    """
    WITH lines AS (
      SELECT event_id AS line_no,
             CAST(user_id % 3 AS BIGINT) AS source_file,
             CASE WHEN event_id % 4 = 0 THEN 'EVENT ' || event_type
                  ELSE '  at frame ' || CAST(event_id AS VARCHAR) END AS line
      FROM events
    ),
    sess AS (
      SELECT source_file, line_no, line,
             sum(CASE WHEN line NOT SIMILAR TO '\\s.*' THEN 1 ELSE 0 END)
               OVER (PARTITION BY source_file ORDER BY line_no) AS s
      FROM lines
    )
    SELECT source_file,
           CAST(min(line_no) AS BIGINT) AS event_start,
           CAST(count(*) AS BIGINT) AS n_lines,
           string_agg(line, chr(10) ORDER BY line_no) AS line
    FROM sess GROUP BY source_file, s
    """,
)
def multiline_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-codec-multiline: whitespace-led continuation lines join
    into their preceding event (sessionized window + group-concat)."""
    ev = _ev(spark, sf_dir)
    lines = ev.select(
        F.col("event_id").alias("line_no"),
        (F.col("user_id") % 3).alias("source_file"),
        F.when(
            F.col("event_id") % 4 == 0, F.concat(F.lit("EVENT "), F.col("event_type"))
        )
        .otherwise(F.concat(F.lit("  at frame "), F.col("event_id").cast("string")))
        .alias("line"),
    )
    return multiline(
        lines, "line", r"^\s", what="previous",
        group_by=("source_file",), order_by="line_no",
    )


# ---------------------------------------------------------------------------
# Network-ish filters
# ---------------------------------------------------------------------------

def _ip_col() -> Column:
    return F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        F.floor(F.col("user_id") / 256).cast("long").__mod__(256).cast("string"),
        F.lit("."),
        (F.col("user_id") % 250).cast("string"),
    )


@query(
    "cidr_tag",
    f"""
    SELECT in_block, CAST(count(*) AS BIGINT) AS cnt
    FROM (
      SELECT ((ipl & 4294901760) = 167837696) OR ((ipl & 4278190080) = 201326592) AS in_block
      FROM (
        SELECT 167772160 + (user_id % 256) * 65536 + ((user_id // 256) % 256) * 256
               + (user_id % 250) AS ipl
        FROM events)
    ) GROUP BY in_block
    """,
)
def cidr_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-cidr: IP-in-CIDR via int64 mask math (no UDF).
    Blocks: 10.1.0.0/16 and 12.0.0.0/8."""
    ev = _ev(spark, sf_dir).withColumn("ip", _ip_col())
    out = cidr(ev, "ip", ["10.1.0.0/16", "12.0.0.0/8"], target="in_block")
    return out.groupBy("in_block").agg(F.count("*").alias("cnt"))


@query(
    "geoip_enrich",
    f"""
    WITH ev AS (
      SELECT event_id,
             167772160 + (user_id % 256) * 65536 + ((user_id // 256) % 256) * 256
             + (user_id % 250) AS ipl
      FROM events),
    blocks(net_start, net_end, country, city) AS (VALUES
      (167772160, 167837695, 'US', 'nyc'),
      (167837696, 167903231, 'DE', 'ber'),
      (167903232, 168034303, 'JP', 'tyo')
    )
    SELECT country, city, CAST(count(*) AS BIGINT) AS cnt
    FROM ev LEFT JOIN blocks ON ipl >= net_start AND ipl <= net_end
    GROUP BY country, city
    """,
)
def geoip_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-geoip shape: broadcast RANGE join of IPs against
    (net_start, net_end, geo attrs) blocks; fact side never shuffles."""
    ev = _ev(spark, sf_dir).withColumn("ip", _ip_col())
    blocks = static_lookup_df(
        spark,
        [
            (167772160, 167837695, "US", "nyc"),
            (167837696, 167903231, "DE", "ber"),
            (167903232, 168034303, "JP", "tyo"),
        ],
        ["net_start", "net_end", "country", "city"],
    )
    out = geoip_range_join(ev, "ip", blocks, attrs=["country", "city"])
    return out.groupBy("country", "city").agg(F.count("*").alias("cnt"))


_UA_BY_TYPE = {
    "click": "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "view": "Mozilla/5.0 (Macintosh; Mac OS X 13) AppleWebKit/605.1 Version/17 Safari/605.1",
    "purchase": "Mozilla/5.0 (X11; Linux x86_64; rv:120.0) Gecko/20100101 Firefox/120.0",
    "signup": "Mozilla/5.0 (iPhone; CPU iPhone OS 17) AppleWebKit/605.1 Mobile/15E148",
    "error": "curl-bot/8.0 (+https://example.com/spider)",
}


def _ua_col() -> Column:
    """Canned UA string per event_type (shared by both useragent gates)."""
    ua: Column = F.lit(_UA_BY_TYPE["error"])
    for etype, s_ in _UA_BY_TYPE.items():
        ua = F.when(F.col("event_type") == etype, F.lit(s_)).otherwise(ua)
    return ua




@query(
    "useragent_classify",
    """
    SELECT CASE event_type
             WHEN 'click' THEN 'Chrome' WHEN 'view' THEN 'Safari'
             WHEN 'purchase' THEN 'Firefox' WHEN 'signup' THEN 'Other'
             ELSE 'bot' END AS ua_name,
           CASE event_type
             WHEN 'click' THEN 'Windows' WHEN 'view' THEN 'macOS'
             WHEN 'purchase' THEN 'Linux' WHEN 'signup' THEN 'iOS'
             ELSE 'Other' END AS ua_os,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def useragent_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-useragent (coarse classes): canned UA strings per
    event_type, classified by the ordered rlike chain."""
    ev = _ev(spark, sf_dir)
    df = useragent(ev.withColumn("ua", _ua_col()), "ua")
    return df.groupBy("ua_name", "ua_os").agg(F.count("*").alias("cnt"))


@query(
    "syslog_pri_decode",
    """
    SELECT CAST(pri % 8 AS BIGINT) AS syslog_severity_code,
           CAST(pri // 8 AS BIGINT) AS syslog_facility_code,
           (['emergency','alert','critical','error','warning','notice',
             'informational','debug'])[(pri % 8) + 1] AS syslog_severity,
           CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT user_id % 192 AS pri FROM events)
    GROUP BY 1, 2, 3
    """,
)
def syslog_pri_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-syslog_pri: <PRI> → facility/severity (pure math)."""
    ev = _ev(spark, sf_dir).withColumn("syslog_pri", F.col("user_id") % 192)
    out = syslog_pri(ev, "syslog_pri")
    return out.groupBy(
        F.col("syslog_severity_code").cast("long").alias("syslog_severity_code"),
        F.col("syslog_facility_code").cast("long").alias("syslog_facility_code"),
        "syslog_severity",
    ).agg(F.count("*").alias("cnt"))


@query(
    "urldecode_field",
    """
    SELECT event_id, 'q ' || event_type || '=' || CAST(user_id AS VARCHAR) AS q
    FROM events
    """,
)
def urldecode_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-urldecode via native url_decode: the encoded input
    is synthesized (%20, %3D), the oracle states the decoded expectation."""
    from logstash_spark.functions import urldecode

    ev = _ev(spark, sf_dir)
    enc = F.concat(
        F.lit("q%20"), F.col("event_type"), F.lit("%3D"), F.col("user_id").cast("string")
    )
    out = urldecode(ev.withColumn("q", enc), "q")
    return out.select("event_id", "q")


# ---------------------------------------------------------------------------
# sprintf / mutate convert / fingerprint / range
# ---------------------------------------------------------------------------


@query(
    "sprintf_sink_path",
    """
    SELECT 'logs-' || event_type || '-' || strftime(ts, '%Y.%m.%d') AS path,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1
    """,
)
def sprintf_sink_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core sprintf templating (`logs-%{event_type}-%{+yyyy.MM.dd}`) — the
    dynamic sink-path pattern (StringInterpolation.java), as partition
    values for a partitioned write."""
    ev = _ev(spark, sf_dir)
    path = sprintf("logs-%{event_type}-%{+yyyy.MM.dd}", ts_col="ts")
    return ev.select(path.alias("path")).groupBy("path").agg(F.count("*").alias("cnt"))


@query(
    "mutate_convert_matrix",
    """
    SELECT event_id,
           COALESCE(CAST(CASE WHEN lower(bool_s) IN ('true','t','yes','y','1','1.0') THEN TRUE
                WHEN lower(bool_s) IN ('false','f','no','n','0','0.0') THEN FALSE
                ELSE NULL END AS VARCHAR), 'invalid') AS flag,
           CAST(TRUNC(CAST(num_s AS DOUBLE)) AS BIGINT) AS int_v,
           CAST(num_s AS DOUBLE) AS float_v
    FROM (SELECT event_id,
                 CASE event_id % 5 WHEN 0 THEN 'yes' WHEN 1 THEN 't' WHEN 2 THEN '0'
                                   WHEN 3 THEN 'no' ELSE 'maybe' END AS bool_s,
                 CAST(round(value, 3) AS VARCHAR) AS num_s
          FROM events)
    """,
)
def mutate_convert_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mutate convert: Logstash boolean truth table + Ruby to_i truncation
    ('1.5' → 1) + float cast."""
    ev = _ev(spark, sf_dir)
    df = ev.select(
        "event_id",
        F.when(F.col("event_id") % 5 == 0, "yes")
        .when(F.col("event_id") % 5 == 1, "t")
        .when(F.col("event_id") % 5 == 2, "0")
        .when(F.col("event_id") % 5 == 3, "no")
        .otherwise("maybe")
        .alias("flag"),
        F.round(F.col("value"), 3).cast("string").alias("int_v"),
        F.round(F.col("value"), 3).cast("string").alias("float_v"),
    )
    out = M.convert(df, {"flag": "boolean", "int_v": "integer", "float_v": "float"})
    # null-out-of-table booleans surfaced explicitly so the oracle compare
    # is null-representation-agnostic
    return out.select(
        "event_id",
        F.coalesce(F.col("flag").cast("string"), F.lit("invalid")).alias("flag"),
        "int_v",
        "float_v",
    )


@query(
    "fingerprint_sha256",
    """
    SELECT event_id,
           sha256(concat_ws('|', event_type, CAST(user_id AS VARCHAR))) AS fp
    FROM events
    """,
)
def fingerprint_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-fingerprint SHA256 with concatenate_sources."""
    ev = _ev(spark, sf_dir)
    out = fingerprint(ev, ["event_type", "user_id"], target="fp", method="SHA256")
    return out.select("event_id", "fp")


@query(
    "range_tagged",
    """
    SELECT CAST(count(*) AS BIGINT) AS out_of_range
    FROM events WHERE value < 10 OR value > 400
    """,
)
def range_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-range: count rows tagged outside [10, 400]."""
    ev = _ev(spark, sf_dir)
    out = range_tag(ev, "value", 10, 400, tag="_rangefailure")
    return out.where(F.array_contains("tags", "_rangefailure")).agg(
        F.count("*").alias("out_of_range")
    )


# ---------------------------------------------------------------------------
# Sessionization / cardinality metrics
# ---------------------------------------------------------------------------


@query(
    "sessionize_gap",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('microsecond', lag(ts) OVER w, ts) > 600000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS sess_no
      FROM g
    )
    SELECT CAST(user_id AS VARCHAR) || '#' || CAST(sess_no AS VARCHAR) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS duration_us
    FROM s GROUP BY 1
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate-filter inactivity_timeout analog: 10-minute-gap sessions
    per user (lag + running sum), then per-session aggregates."""
    ev = _ev(spark, sf_dir)
    s = sessionize(ev, "user_id", "ts", gap_seconds=600)
    return s.groupBy("session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("duration_us"),
    )


@query(
    "xml_xpath",
    """
    SELECT event_id, event_type AS t, CAST(user_id AS VARCHAR) AS u
    FROM events
    """,
)
def xml_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-xml: XPath extraction via Spark's native xpath_*
    SQL functions over a synthesized document (oracle states the
    round-trip expectation directly — DuckDB has no xpath)."""
    ev = _ev(spark, sf_dir)
    xml = F.concat(
        F.lit("<e><t>"), F.col("event_type"), F.lit("</t><u>"),
        F.col("user_id").cast("string"), F.lit("</u></e>"),
    )
    df = ev.withColumn("xml", xml)
    return df.select(
        "event_id",
        F.expr("xpath_string(xml, '/e/t')").alias("t"),
        F.expr("xpath_string(xml, '/e/u')").alias("u"),
    )


@query(
    "throttle_sliding_tag",
    """
    WITH c AS (
      SELECT user_id, ts,
             count(*) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS cw
      FROM events)
    SELECT CAST(user_id AS BIGINT) AS user_id, CAST(count(*) AS BIGINT) AS throttled
    FROM c WHERE cw > 1 GROUP BY user_id
    """,
)
def throttle_sliding_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window throttle: events whose trailing 1h window holds >1
    event of the same user (RANGE frame, single keyed shuffle)."""
    from logstash_spark.operators.aggregate import throttle_sliding

    ev = _ev(spark, sf_dir)
    out = throttle_sliding(ev, "user_id", "ts", period_seconds=3600, max_count=1)
    return (
        out.where(F.array_contains("tags", "throttled"))
        .groupBy("user_id")
        .agg(F.count("*").alias("throttled"))
    )


@query(
    "cardinality_metrics",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users
    FROM events GROUP BY event_type
    """,
)
def cardinality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics side-table cardinality rollup (exact distinct here so the
    oracle matches; production uses approx_count_distinct — HLL sketches
    merge across partitions with one shuffle)."""
    ev = _ev(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.count_distinct("user_id").alias("users")
    )


@query(
    "useragent_version",
    """
    SELECT CASE event_type
             WHEN 'click' THEN 'Chrome' WHEN 'view' THEN 'Safari'
             WHEN 'purchase' THEN 'Firefox' WHEN 'signup' THEN 'Other'
             ELSE 'bot' END AS ua_name,
           CASE event_type
             WHEN 'click' THEN 120 WHEN 'view' THEN 17
             WHEN 'purchase' THEN 120 END AS ua_major,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def useragent_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """useragent major-version extraction (uap precedence: Safari's
    version from the Version/ token; bots/unknowns null)."""
    ev = _ev(spark, sf_dir)
    df = useragent(ev.withColumn("ua", _ua_col()), "ua")
    return df.groupBy("ua_name", "ua_major").agg(F.count("*").alias("cnt"))

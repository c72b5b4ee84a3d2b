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


# ---------------------------------------------------------------------------
# DLQ replay (logstash-input-dead_letter_queue / DeadLetterQueueReader.java)
# ---------------------------------------------------------------------------


@query(
    "dlq_replay",
    """
    SELECT event_id,
           event_type,
           CASE WHEN event_id % 7 = 0 THEN ''
                WHEN event_id % 3 = 0 THEN 'stale'
                ELSE '' END AS leftover_tags
    FROM events
    WHERE event_id % 7 = 0 OR event_id % 3 = 0
    """,
)
def dlq_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dead_letter_queue source semantics over a synthesized DLQ table:
    events carry `_dlq_reason` (comma-joined failure tags); replay
    selects by EXACT reason membership (grok-failures and the
    date+grok combo, not the `_grokparsefailure_x` decoy), strips the
    DLQ metadata, and clears the matched failure tag from `tags`."""
    from logstash_spark.sources.dlq import dlq_replay_frame

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    reason = (
        F.when(eid % 7 == 0, F.lit("_grokparsefailure"))
        .when(eid % 3 == 0, F.lit("_dateparsefailure,_grokparsefailure,stale"))
        .otherwise(F.lit("_grokparsefailure_x"))
    )
    dlq = ev.withColumn("_dlq_reason", reason).withColumn(
        "tags", F.split(reason, ",")
    )
    out = dlq_replay_frame(
        dlq,
        reason_filter="_grokparsefailure",
        clear_tags=["_grokparsefailure", "_dateparsefailure"],
    )
    return out.select(
        "event_id",
        "event_type",
        F.concat_ws(",", F.col("tags")).alias("leftover_tags"),
    )


# ---------------------------------------------------------------------------
# kv option surface (logstash-filter-kv: duplicates, transforms, excludes)
# ---------------------------------------------------------------------------


@query(
    "kv_options",
    """
    SELECT event_id,
           'alpha,' || event_type AS tag_vals,
           CAST(event_id AS VARCHAR) || ',9' AS id_vals,
           CAST(user_id AS VARCHAR) AS uid_last
    FROM events
    """,
)
def kv_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kv duplicate-value collection ('array' = allow_duplicate_values),
    transform_key=lowercase, exclude_keys, and last-wins over a line with
    repeated keys + a separator-less junk token (skipped)."""
    from logstash_spark.operators.parse import kv

    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    line = F.concat(
        F.lit("Tag=alpha tag="), F.col("event_type"),
        F.lit(" id="), eid.cast("string"),
        F.lit(" junk id=9 drop=me uid="), uid.cast("string"),
        F.lit(" uid="), uid.cast("string"),
    )
    df = ev.withColumn("line", line)
    df = kv(
        df, "line", duplicates="array", transform_key="lowercase",
        exclude_keys=["drop"], target="m",
    )
    df = kv(df, "line", exclude_keys=["drop"], target="ml")
    return df.select(
        "event_id",
        F.concat_ws(",", F.element_at("m", "tag")).alias("tag_vals"),
        F.concat_ws(",", F.element_at("m", "id")).alias("id_vals"),
        F.element_at("ml", "uid").alias("uid_last"),
    )


# ---------------------------------------------------------------------------
# Multiline guards (logstash-codec-multiline max_lines/max_bytes caps)
# ---------------------------------------------------------------------------


@query(
    "multiline_guards",
    """
    WITH ev AS (SELECT event_id, 1 + event_id % 7 AS L FROM events),
    lines AS (
      SELECT event_id, L, js.j,
             CASE WHEN js.j = 0 THEN 'EVT ' || CAST(event_id AS VARCHAR)
                  ELSE '+c ' || CAST(event_id AS VARCHAR) || ' ' || CAST(js.j AS VARCHAR)
             END AS txt,
             js.j // 3 AS chunk
      FROM ev, (SELECT unnest(range(0, 7)) AS j) js
      WHERE js.j < L
    ),
    chunks AS (
      SELECT event_id, chunk,
             CAST(min(j) AS BIGINT) AS event_start,
             CAST(count(*) AS BIGINT) AS n_lines,
             md5(string_agg(txt, chr(10) ORDER BY j)) AS msg_md5
      FROM lines GROUP BY event_id, chunk
    )
    SELECT event_id, event_start, n_lines, msg_md5,
           chunk < max(chunk) OVER (PARTITION BY event_id) AS toolong
    FROM chunks
    """,
)
def multiline_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multiline codec with the max_lines cap: blobs of 1–7 lines
    (start line + `+`-prefixed continuations) split by the line codec,
    re-joined by multiline sessionization, force-flushed every 3 lines;
    all but each event's last chunk carry `_multiline_toolong`."""
    from logstash_spark.operators.codec import line_codec, multiline

    ev = _ev(spark, sf_dir)
    eid = F.col("event_id")
    n_lines = (F.lit(1) + eid % 7).cast("int")
    txt = lambda j: F.when(  # noqa: E731
        j == 0, F.concat(F.lit("EVT "), eid.cast("string"))
    ).otherwise(
        F.concat(F.lit("+c "), eid.cast("string"), F.lit(" "), j.cast("string"))
    )
    blob = F.concat_ws(
        "\n", F.transform(F.sequence(F.lit(0), n_lines - 1), txt)
    )
    df = ev.select("event_id", blob.alias("blob"))
    split = line_codec(df, "blob", target="message")
    joined = multiline(
        split, "message", r"^\+", what="previous",
        group_by=("event_id",), order_by="line_no", max_lines=3,
    )
    return joined.select(
        "event_id",
        F.col("event_start").cast("long").alias("event_start"),
        "n_lines",
        F.md5(F.col("message")).alias("msg_md5"),
        F.array_contains("tags", "_multiline_toolong").alias("toolong"),
    )


# ---------------------------------------------------------------------------
# GeoIP attribute enrichment (logstash-filter-geoip over an mmdb-shaped
# block table built with geoip_blocks)
# ---------------------------------------------------------------------------


@query(
    "geoip_attributes",
    """
    SELECT event_id,
           '10.' || CAST(event_id % 256 AS VARCHAR) || '.'
                 || CAST(user_id % 256 AS VARCHAR) || '.'
                 || CAST(event_id % 100 AS VARCHAR) AS ip,
           CASE WHEN event_id % 256 < 64  THEN 'US'
                WHEN event_id % 256 < 128 THEN 'DE'
                WHEN event_id % 256 < 192 THEN 'JP'
                ELSE 'BR' END AS country_code2,
           CASE WHEN event_id % 256 < 64  THEN 'NA'
                WHEN event_id % 256 < 128 THEN 'EU'
                WHEN event_id % 256 < 192 THEN 'AS'
                ELSE 'SA' END AS continent_code,
           CASE WHEN event_id % 256 < 64  THEN 'New York'
                WHEN event_id % 256 < 128 THEN 'Berlin'
                WHEN event_id % 256 < 192 THEN 'Tokyo'
                ELSE 'Sao Paulo' END AS city_name,
           CASE WHEN event_id % 256 < 64  THEN 40.71
                WHEN event_id % 256 < 128 THEN 52.52
                WHEN event_id % 256 < 192 THEN 35.68
                ELSE -23.55 END AS latitude,
           CAST(CASE WHEN event_id % 256 < 64  THEN 15169
                WHEN event_id % 256 < 128 THEN 3320
                WHEN event_id % 256 < 192 THEN 2914
                ELSE 26599 END AS BIGINT) AS asn,
           CASE WHEN event_id % 256 < 64  THEN 'America/New_York'
                WHEN event_id % 256 < 128 THEN 'Europe/Berlin'
                WHEN event_id % 256 < 192 THEN 'Asia/Tokyo'
                ELSE 'America/Sao_Paulo' END AS timezone
    FROM events
    """,
)
def geoip_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geoip with the full mmdb attribute set over a canned block table
    (geoip_blocks builder, GeoLite2-City-Blocks shape): 10.0.0.0/8 split
    into four /10s, each carrying country/continent/city/lat/lon/tz/ASN.
    Broadcast range join — the fact side never shuffles."""
    from logstash_spark.operators.enrich import geoip_blocks, geoip_range_join

    blocks = geoip_blocks(
        spark,
        [
            ("10.0.0.0/10", {"country_code2": "US", "country_name": "United States",
                             "continent_code": "NA", "city_name": "New York",
                             "latitude": 40.71, "longitude": -74.01,
                             "timezone": "America/New_York", "asn": 15169,
                             "as_org": "Example US"}),
            ("10.64.0.0/10", {"country_code2": "DE", "country_name": "Germany",
                              "continent_code": "EU", "city_name": "Berlin",
                              "latitude": 52.52, "longitude": 13.40,
                              "timezone": "Europe/Berlin", "asn": 3320,
                              "as_org": "Example DE"}),
            ("10.128.0.0/10", {"country_code2": "JP", "country_name": "Japan",
                               "continent_code": "AS", "city_name": "Tokyo",
                               "latitude": 35.68, "longitude": 139.69,
                               "timezone": "Asia/Tokyo", "asn": 2914,
                               "as_org": "Example JP"}),
            ("10.192.0.0/10", {"country_code2": "BR", "country_name": "Brazil",
                               "continent_code": "SA", "city_name": "Sao Paulo",
                               "latitude": -23.55, "longitude": -46.63,
                               "timezone": "America/Sao_Paulo", "asn": 26599,
                               "as_org": "Example BR"}),
        ],
    )
    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    ip = F.format_string("10.%d.%d.%d", eid % 256, uid % 256, eid % 100)
    df = ev.select("event_id", ip.alias("ip"))
    out = geoip_range_join(df, "ip", blocks)
    return out.select(
        "event_id", "ip", "country_code2", "continent_code", "city_name",
        "latitude", "asn", "timezone",
    )


# ---------------------------------------------------------------------------
# Pipeline-to-pipeline graph (distributor → workers → collector)
# ---------------------------------------------------------------------------

_GRAPH_CONFS = {
    "up": """
      input { file { path => "<bound by caller>" } }
      filter {
        if [event_type] == "error" {
          mutate { add_field => { "sev" => "high" } }
        }
      }
      output {
        if [event_type] == "error" { pipeline { send_to => ["err"] } }
        else { pipeline { send_to => ["ok"] } }
      }
    """,
    "err_pipe": """
      input { pipeline { address => "err" } }
      filter { mutate { add_field => { "handled" => "alert" } } }
      output { pipeline { send_to => ["merged"] } }
    """,
    "ok_pipe": """
      input { pipeline { address => "ok" } }
      filter { mutate { add_field => { "handled" => "archive" } } }
      output { pipeline { send_to => ["merged"] } }
    """,
    "coll": """
      input { pipeline { address => "merged" } }
      output { file { path => "out" } }
    """,
}


@query(
    "pipeline_graph",
    """
    SELECT event_type,
           CASE WHEN event_type = 'error' THEN 'alert' ELSE 'archive' END
             AS handled,
           CASE WHEN event_type = 'error' THEN 'high' END AS sev,
           COUNT(*) AS cnt
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def pipeline_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-to-pipeline composition (reference: logstash
    pipeline-to-pipeline docs, PipelineBus; `pipeline { send_to/address }`
    plugins): a distributor routes error events to one worker pipeline
    and the rest to another, both workers send to a collector — four
    `.conf` texts compiled by the LSCL front end and composed by
    plans.graph into ONE Catalyst plan (no inter-pipeline queue). The
    collector's output is counted per (event_type, handled, sev); `sev`
    exists only on the gated-mutate true branch, proving gate + address
    union semantics survive the graph."""
    from logstash_spark.operators.route import route_filter
    from logstash_spark.plans.graph import compose_pipelines
    from logstash_spark.plans.lscl import compile_pipelines

    specs, _ = compile_pipelines(_GRAPH_CONFS)
    routed = compose_pipelines({"up": _ev(spark, sf_dir)}, specs)
    out = route_filter(routed["coll"], "out")
    return out.groupBy("event_type", "handled", "sev").agg(
        F.count(F.lit(1)).alias("cnt")
    )


# ---------------------------------------------------------------------------
# tld / alter / age / metricize (round-3 breadth batch 2)
# ---------------------------------------------------------------------------


@query(
    "tld_extract",
    """
    WITH h AS (
        SELECT event_id, user_id,
               CASE WHEN event_id % 3 = 0 THEN 'www.' ELSE '' END
                 || 'svc' || CAST(user_id % 50 AS VARCHAR)
                 || '.brand' || CAST(event_id % 97 AS VARCHAR) || '.'
                 || list_extract(['co.uk','com','org','com.au','co.jp','net'],
                                 CAST(event_id % 6 AS INT) + 1) AS host,
               list_extract(['co.uk','com','org','com.au','co.jp','net'],
                            CAST(event_id % 6 AS INT) + 1) AS sfx
        FROM events
    )
    SELECT event_id, host,
           sfx AS tld,
           'brand' || CAST(event_id % 97 AS VARCHAR) AS sld,
           CASE WHEN event_id % 3 = 0 THEN 'www.' ELSE '' END
             || 'svc' || CAST(user_id % 50 AS VARCHAR) AS trd,
           'brand' || CAST(event_id % 97 AS VARCHAR) || '.' || sfx AS domain
    FROM h
    """,
)
def tld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-tld over synthesized hostnames spanning multi-label
    public suffixes (co.uk/com.au/co.jp) and plain TLDs. The oracle derives
    ground truth from the synthesis recipe — an independent derivation, not
    a re-run of the parser (reference: logstash-filter-tld + public_suffix
    gem field set tld/sld/trd/domain)."""
    from logstash_spark.functions import tld as tld_op

    ev = _ev(spark, sf_dir)
    eid, uid = F.col("event_id"), F.col("user_id")
    sfx = F.element_at(
        F.array(*[F.lit(s) for s in ["co.uk", "com", "org", "com.au", "co.jp", "net"]]),
        (eid % 6 + 1).cast("int"),
    )
    host = F.concat(
        F.when(eid % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("svc"), (uid % 50).cast("string"),
        F.lit(".brand"), (eid % 97).cast("string"), F.lit("."), sfx,
    )
    out = tld_op(ev.withColumn("host", host), "host")
    return out.select("event_id", "host", "tld", "sld", "trd", "domain")


@query(
    "metricize_split",
    """
    SELECT event_id, 'cpu' AS metric, round(value, 3) AS value FROM events
    UNION ALL
    SELECT event_id, 'mem' AS metric, round(value * 2, 3) AS value
    FROM events WHERE event_id % 7 <> 0
    """,
)
def metricize_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-metricize: one event carrying cpu+mem readings →
    one event per metric; absent (null) metrics skipped like the plugin
    skips missing fields (reference: logstash-filter-metricize)."""
    from logstash_spark.operators.multiplicity import metricize

    ev = _ev(spark, sf_dir).select(
        "event_id",
        F.round(F.col("value"), 3).alias("cpu"),
        F.when(F.col("event_id") % 7 != 0, F.round(F.col("value") * 2, 3)).alias("mem"),
    )
    return metricize(ev, ["cpu", "mem"])


@query(
    "age_alter_tagged",
    """
    SELECT event_id,
           CAST(floor(date_diff('microsecond', ts, TIMESTAMP '2024-02-01 00:00:00')
                      / 1000000.0) AS BIGINT) AS age_s,
           date_diff('microsecond', ts, TIMESTAMP '2024-02-01 00:00:00')
             / 1000000.0 > 1209600 AS is_old,
           CASE WHEN event_type = 'error' THEN 'failure' ELSE event_type END AS etype,
           CASE WHEN event_type = 'purchase' THEN 'revenue' ELSE 'ops' END AS lane
    FROM events
    """,
)
def age_alter_tagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-age (pinned reference instant, 14-day max_age tag)
    composed with logstash-filter-alter (condrewrite error→failure,
    condrewriteother purchase→revenue-lane). Age floor-rounded to whole
    seconds so both engines hash identically."""
    from logstash_spark.functions import age as age_op, alter as alter_op

    ev = _ev(spark, sf_dir)
    a = age_op(ev, source="ts", now="2024-02-01 00:00:00", max_age=1209600.0)
    a = a.withColumn("lane", F.lit("ops"))
    a = alter_op(
        a,
        condrewrite=[("event_type", "error", "failure")],
        condrewriteother=[("event_type", "purchase", "lane", "revenue")],
    )
    return a.select(
        "event_id",
        F.floor(F.col("age")).cast("bigint").alias("age_s"),
        F.array_contains(F.col("tags"), "_agefilter").alias("is_old"),
        F.col("event_type").alias("etype"),
        F.coalesce(F.col("lane"), F.lit("ops")).alias("lane"),
    )


@query(
    "throttle_before_after",
    """
    WITH seq AS (
      SELECT event_id, user_id,
             row_number() OVER (
               PARTITION BY user_id, time_bucket(INTERVAL '1 day', ts)
               ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT user_id,
           CAST(count(*) FILTER (WHERE rn < 2) AS BIGINT) AS before_cnt,
           CAST(count(*) FILTER (WHERE rn > 3) AS BIGINT) AS after_cnt,
           CAST(count(*) FILTER (WHERE rn < 2 OR rn > 3) AS BIGINT) AS tagged_cnt
    FROM seq GROUP BY user_id
    """,
)
def throttle_before_after(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-throttle full option surface: before_count=2
    tags the first event of each (user, day) window (sequence < 2),
    after_count=3 tags everything past the third — the reference's
    two-bound form (§before_count/after_count) over one window pass."""
    from logstash_spark.operators.aggregate import throttle

    ev = _ev(spark, sf_dir)
    out = throttle(
        ev, "user_id", "ts", period_seconds=86400, before_count=2,
        after_count=3, tag="throttled", tiebreak="event_id",
    )
    tagged = F.array_contains("tags", "throttled")
    # re-derive the sequence bounds for the per-bound counts (the op
    # itself only tags; the gate splits the tag by cause)
    from pyspark.sql.window import Window

    win = F.window(F.col("ts"), "86400 seconds").getField("start")
    w = Window.partitionBy("user_id", win).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    out = out.withColumn("_rn", F.row_number().over(w))
    return out.groupBy("user_id").agg(
        F.count(F.when(F.col("_rn") < 2, 1)).alias("before_cnt"),
        F.count(F.when(F.col("_rn") > 3, 1)).alias("after_cnt"),
        F.count(F.when(tagged, 1)).alias("tagged_cnt"),
    )


# ---------------------------------------------------------------------------
# As-of join (point-in-time enrichment)
# ---------------------------------------------------------------------------


@query(
    "asof_enrich",
    """
    WITH dim AS (
      SELECT event_type, ts AS valid_from, event_id AS cfg_version
      FROM events WHERE event_id % 997 = 0
    )
    SELECT l.event_id, l.ts, l.event_type,
           d.cfg_version, d.valid_from AS cfg_since
    FROM events l ASOF LEFT JOIN dim d
      ON l.event_type = d.event_type AND l.ts >= d.valid_from
    """,
)
def asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (`enrich.asof_join`): every event picks up the
    config version active at its timestamp (latest dim row with
    valid_from <= ts per event_type). The dim table is synthesized from
    every 997th event. Spark has no native ASOF; the op is the
    sort-merge re-expression — union + ONE window carry-forward, one
    shuffle on the key, no O(N*M) range join. DuckDB's native ASOF LEFT
    JOIN is the oracle."""
    from logstash_spark.operators.enrich import asof_join

    ev = _ev(spark, sf_dir).select("event_id", "ts", "event_type")
    dim = (
        _ev(spark, sf_dir)
        .where(F.col("event_id") % 997 == 0)
        .select(
            "event_type",
            F.col("ts").alias("valid_from"),
            F.col("event_id").alias("cfg_version"),
        )
    )
    return asof_join(
        ev,
        dim,
        ["event_type"],
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["cfg_version"],
        right_tiebreak="cfg_version",
        matched_ts="cfg_since",
    )

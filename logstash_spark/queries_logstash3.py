"""Correctness-gate queries, batch 3: failure-tagging semantics
("failure is data, never an exception" — SURVEY.md §1.1 delta 3),
translate regex mode, conditional elapsed pairing, and the salted
skew aggregation path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.operators.aggregate import aggregate_salted, elapsed
from logstash_spark.operators.enrich import translate
from logstash_spark.operators.parse import date as date_op
from logstash_spark.operators.parse import grok, json_filter
from logstash_spark.queries import query


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@query(
    "parse_failure_tags",
    """
    SELECT 'grok' AS op, (event_id % 7 = 0) AS has_fail,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
    UNION ALL
    SELECT 'date', (event_id % 5 = 0), CAST(count(*) AS BIGINT)
    FROM events GROUP BY 1, 2
    UNION ALL
    SELECT 'json', (event_id % 11 = 0), CAST(count(*) AS BIGINT)
    FROM events GROUP BY 1, 2
    """,
)
def parse_failure_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure-is-data across all three parse filters in one gate
    (folded from the r01 grok/date/json_failure_tag queries): malformed
    input → `_grokparsefailure` / `_dateparsefailure` / `_jsonparsefailure`
    tag, row passes through — never an exception."""
    ev = _ev(spark, sf_dir)

    line = F.when(
        F.col("event_id") % 7 == 0, F.lit("!!corrupt!!")
    ).otherwise(F.concat(F.lit("type="), F.col("event_type")))
    g = grok(ev.withColumn("line", line), "line", r"^type=%{WORD:etype}$")
    grok_agg = (
        g.select(F.array_contains("tags", "_grokparsefailure").alias("has_fail"))
        .groupBy("has_fail")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("grok").alias("op"), "has_fail", "cnt")
    )

    raw = F.when(F.col("event_id") % 5 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    )
    d = date_op(
        ev.withColumn("raw_ts", raw), "raw_ts", ["yyyy-MM-dd HH:mm:ss"], target="parsed"
    )
    date_agg = (
        d.select(F.array_contains("tags", "_dateparsefailure").alias("has_fail"))
        .groupBy("has_fail")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("date").alias("op"), "has_fail", "cnt")
    )

    doc = F.when(F.col("event_id") % 11 == 0, F.lit("{broken")).otherwise(
        F.concat(F.lit('{"k": '), F.col("user_id").cast("string"), F.lit("}"))
    )
    j = json_filter(ev.withColumn("doc", doc), "doc", schema="k bigint", target="pj")
    json_agg = (
        j.select(F.array_contains("tags", "_jsonparsefailure").alias("has_fail"))
        .groupBy("has_fail")
        .agg(F.count("*").alias("cnt"))
        .select(F.lit("json").alias("op"), "has_fail", "cnt")
    )

    return grok_agg.unionByName(date_agg).unionByName(json_agg)


@query(
    "translate_regex_mode",
    """
    SELECT event_id,
           CASE WHEN event_type SIMILAR TO '(click|view).*' THEN 'engagement'
                WHEN event_type SIMILAR TO '.*(purchase|signup).*' THEN 'conversion'
                ELSE 'other' END AS category
    FROM events
    """,
)
def translate_regex_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """translate regex mode: ordered rlike chain (first matching pattern
    wins), fallback for no match."""
    ev = _ev(spark, sf_dir)
    out = translate(
        ev,
        "event_type",
        "category",
        {"^(click|view)": "engagement", "(purchase|signup)": "conversion"},
        regex=True,
        fallback="other",
    )
    return out.select("event_id", "category")


@query(
    "elapsed_conditional",
    """
    SELECT user_id,
           CAST(date_diff('microsecond',
                          min(CASE WHEN event_type = 'signup' THEN ts END),
                          max(CASE WHEN event_type = 'purchase' THEN ts END))
                AS BIGINT) AS elapsed_us
    FROM events GROUP BY user_id
    HAVING min(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
       AND max(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
    """,
)
def elapsed_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-elapsed with start/end conditions: first signup →
    last purchase per user, one shuffle (conditional min/max, no
    self-join)."""
    ev = _ev(spark, sf_dir)
    out = elapsed(
        ev,
        "user_id",
        "ts",
        start_cond=F.col("event_type") == "signup",
        end_cond=F.col("event_type") == "purchase",
    )
    return out.where(
        F.col("start_ts").isNotNull() & F.col("end_ts").isNotNull()
    ).select("user_id", "elapsed_us")


@query(
    "dissect_advanced",
    """
    SELECT event_id,
           split_part(m, '-', 1) AS proto,
           split_part(split_part(m, ' ', 1), '-', 2) || '_' ||
             split_part(split_part(m, ' ', 1), '-', 3) AS host_zone,
           split_part(m, ' ', 3) AS msg
    FROM (SELECT event_id,
                 'tcp-' || event_type || '-z' || CAST(user_id % 4 AS VARCHAR)
                 || ' ignored ' || CAST(event_id AS VARCHAR) AS m
          FROM events)
    """,
)
def dissect_advanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dissect %{+append} (joined with append_separator) and %{?skip}:
    'tcp-<type>-z<n> ignored <id>' → proto, host_zone (appended), msg."""
    from logstash_spark.operators.parse import dissect

    ev = _ev(spark, sf_dir)
    m = F.concat(
        F.lit("tcp-"), F.col("event_type"), F.lit("-z"),
        (F.col("user_id") % 4).cast("string"), F.lit(" ignored "),
        F.col("event_id").cast("string"),
    )
    df = ev.withColumn("m", m)
    out = dissect(
        df, "m", "%{proto}-%{host_zone}-%{+host_zone} %{?junk} %{msg}",
        append_separator="_",
    )
    return out.select("event_id", "proto", "host_zone", "msg")


@query(
    "grok_multi_pattern",
    """
    SELECT event_id,
           CASE WHEN event_id % 2 = 0
                THEN split_part(m, '=', 2)
                ELSE split_part(split_part(m, '<', 2), '>', 1) END AS etype,
           (event_id % 2 != 0) AS used_alt
    FROM (SELECT event_id,
                 CASE WHEN event_id % 2 = 0 THEN 'type=' || event_type
                      ELSE 'evt<' || event_type || '>' END AS m
          FROM events)
    """,
)
def grok_multi_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grok break_on_match: pattern list, first match wins; rows alternate
    between two formats, each caught by exactly one pattern."""
    ev = _ev(spark, sf_dir)
    m = F.when(
        F.col("event_id") % 2 == 0, F.concat(F.lit("type="), F.col("event_type"))
    ).otherwise(F.concat(F.lit("evt<"), F.col("event_type"), F.lit(">")))
    df = ev.withColumn("m", m)
    g = grok(
        df, "m",
        [r"^type=%{WORD:etype}$", r"^evt<%{WORD:alt_type}>$"],
    )
    return g.select(
        "event_id",
        F.coalesce(F.col("etype"), F.col("alt_type")).alias("etype"),
        F.col("alt_type").isNotNull().alias("used_alt"),
    )


@query(
    "prune_projection",
    """
    SELECT event_id, event_type FROM events
    """,
)
def prune_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-prune: whitelist regex → driver-side select, so
    Catalyst prunes the parquet scan to the kept columns."""
    from logstash_spark.functions import prune

    ev = _ev(spark, sf_dir)
    return prune(ev, whitelist=r"^event_")


@query(
    "de_dot_rename",
    """
    SELECT event_id, event_type AS event_meta_type
    FROM events
    """,
)
def de_dot_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-de_dot: dotted field names → separator-joined
    (pure driver-side schema rename, zero data movement)."""
    from logstash_spark.functions import de_dot

    ev = _ev(spark, sf_dir).select(
        "event_id", F.col("event_type").alias("event.meta.type")
    )
    out = de_dot(ev, separator="_")
    return out.select("event_id", "event_meta_type")


@query(
    "environment_field",
    """
    SELECT event_id, 'bench' AS deploy_env FROM events
    """,
)
def environment_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-environment: env var → literal column at PLAN time
    (no per-row work; the value is a broadcast constant)."""
    import os as _os

    from logstash_spark.functions import environment

    prev = _os.environ.get("LS_DEPLOY_ENV")
    _os.environ["LS_DEPLOY_ENV"] = "bench"
    try:
        ev = _ev(spark, sf_dir)
        out = environment(ev, {"deploy_env": "LS_DEPLOY_ENV"})
    finally:
        # don't leak process-global state into later queries/tests
        if prev is None:
            del _os.environ["LS_DEPLOY_ENV"]
        else:
            _os.environ["LS_DEPLOY_ENV"] = prev
    return out.select("event_id", "deploy_env")


@query(
    "translate_multi_enrich",
    """
    SELECT e.event_id, e.event_type,
           COALESCE(d.category, 'other') AS category,
           COALESCE(d.weight, 0) AS weight
    FROM events e
    LEFT JOIN (VALUES ('click', 'engagement', 1), ('view', 'engagement', 1),
                      ('purchase', 'revenue', 5), ('signup', 'onboarding', 3))
         AS d(event_type, category, weight)
      ON e.event_type = d.event_type
    """,
)
def translate_multi_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jdbc_static analog: multi-column broadcast dictionary join with
    per-column fallbacks (translate_multi)."""
    from logstash_spark.operators.enrich import static_lookup_df, translate_multi

    ev = _ev(spark, sf_dir)
    dict_df = static_lookup_df(
        spark,
        [("click", "engagement", 1), ("view", "engagement", 1),
         ("purchase", "revenue", 5), ("signup", "onboarding", 3)],
        ["event_type", "category", "weight"],
    )
    out = translate_multi(
        ev, "event_type", dict_df, "event_type",
        fallbacks={"category": "other", "weight": 0},
    )
    return out.select("event_id", "event_type", "category", F.col("weight").cast("long").alias("weight"))


@query(
    "metrics_rates",
    """
    SELECT strftime(time_bucket(INTERVAL '5 minutes', ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           round(count(*) / 300.0, 6) AS rate_per_sec
    FROM events GROUP BY 1, 2
    """,
)
def metrics_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """logstash-filter-metrics with rates: tumbling counts + events/sec
    (the 1-min-rate meter analog, window-exact instead of EWMA)."""
    from logstash_spark.operators.aggregate import metrics

    ev = _ev(spark, sf_dir)
    m = metrics(ev, "ts", ["event_type"], window_duration="5 minutes", rates=True)
    return m.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "cnt",
        F.round("rate_per_sec", 6).alias("rate_per_sec"),
    )


@query(
    "aggregate_salted_skew",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,3))), 3) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def aggregate_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted aggregation for skewed keys (SURVEY.md §4 skew
    handling): groupBy(key, salt) partials then merge — numerically
    identical to the plain groupBy the oracle computes (decimal sums)."""
    ev = _ev(spark, sf_dir).withColumn(
        "value_dec", F.col("value").cast("decimal(18,3)")
    )
    out = aggregate_salted(
        ev,
        "event_type",
        {"n": ("count", None), "sum_value": ("sum", "value_dec")},
        salt_buckets=16,
        salt_on="event_id",
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("sum_value"), 3).cast("double").alias("sum_value"),
    )

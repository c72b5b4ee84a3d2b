"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship parse→enrich→route→aggregate pipeline
over a log line synthesized from the sf0.001 `events` table;
`queries()`/`oracle_sql()` expose every implemented operator from
SURVEY.md §2 with a DuckDB oracle (see logstash_spark/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grok-parse a synthesized log line from events, enrich
    event_type via broadcast translate, fan-out route, aggregate per sink."""
    from pyspark.sql import functions as F

    from logstash_spark.operators.enrich import translate
    from logstash_spark.operators.parse import grok
    from logstash_spark.operators.route import add_routes

    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    msg = F.concat(
        F.col("event_type"), F.lit("["), F.col("user_id").cast("string"),
        F.lit("]: event="), F.col("event_id").cast("string"),
    )
    df = ev.withColumn("message", msg)
    df = grok(df, "message", r"^%{WORD:verb}\[%{NONNEGINT:uid:int}\]: event=%{NONNEGINT:eid:int}$")
    df = translate(
        df, "verb", "category",
        {"signup": "onboarding", "purchase": "revenue", "click": "engagement",
         "view": "engagement"},
        fallback="other",
    )
    routed = add_routes(
        df,
        {
            "sink_errors": '[verb] == "error" or "_grokparsefailure" in [tags]',
            "sink_revenue": '[category] == "revenue"',
            "sink_engage": '[category] == "engagement"',
        },
        else_sink="sink_rest",
    )
    return (
        routed.select(F.explode("routes").alias("sink"), "category", "value")
        .groupBy("sink", "category")
        .agg(F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logstash_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from logstash_spark.queries import ORACLES

    return dict(ORACLES)

"""Correctness-gate queries, batch 8 (round 3, late): the external-
lookup enrichment family (logstash-filter-dns / -memcached /
-jdbc_streaming analogs over the injectable-client `lookup_enrich`
mapInPandas operator). The clients here are the deterministic in-repo
ones (DictClient, SqliteLookupClient over a synthesized sqlite file) so
the oracle can derive every expected value INDEPENDENTLY from event_id
arithmetic — the lookup path (worker client memo, in-batch dedupe, LRU
caches, failure tagging) is the code under test.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query

_DB_PATH: str | None = None


def _geo_db() -> str:
    """Deterministic sqlite lookup table, built once per process:
    host-k → two rows (east/west) for k<20, one row (eu) for 20<=k<40,
    no rows for k>=40."""
    global _DB_PATH
    if _DB_PATH and os.path.exists(_DB_PATH):
        return _DB_PATH
    fd, path = tempfile.mkstemp(prefix="lookup_gate_", suffix=".db")
    os.close(fd)
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE geo (host TEXT, code TEXT, region TEXT)")
    rows = []
    for k in range(40):
        if k < 20:
            rows.append((f"host-{k}", f"C{k}", "east"))
            rows.append((f"host-{k}", f"C{k}", "west"))
        else:
            rows.append((f"host-{k}", f"C{k}", "eu"))
    conn.executemany("INSERT INTO geo VALUES (?,?,?)", rows)
    conn.commit()
    conn.close()
    _DB_PATH = path
    return path


@query(
    "external_lookup_enrich",
    """
    WITH ev AS (
      SELECT event_id, 'host-' || CAST(event_id % 50 AS VARCHAR) AS host,
             event_id % 50 AS k
      FROM events WHERE event_id % 7 = 0
    )
    SELECT event_id,
           host,
           CASE WHEN k < 40
                THEN '10.0.' || CAST(k AS VARCHAR) || '.1'
                ELSE host END AS resolved_host,
           CASE WHEN k >= 40 THEN '_dnsfailure' ELSE '' END AS fail_tags,
           CASE WHEN k < 20 THEN 2 WHEN k < 40 THEN 1 ELSE 0 END AS n_geo_rows,
           CASE WHEN k < 40 THEN 'C' || CAST(k AS VARCHAR) END AS first_code,
           CASE WHEN k < 20 THEN 'east' WHEN k < 40 THEN 'eu' END AS first_region
    FROM ev
    """,
)
def external_lookup_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dns (replace action, DictClient) + jdbc_streaming (sqlite client,
    array<struct> target) through the shared lookup_enrich operator.
    Hosts 40-49 miss both lookups → _dnsfailure tag + empty geo. The
    oracle recomputes every value from event_id % 50 arithmetic, never
    replaying the lookup machinery."""
    from logstash_spark.operators.lookup import (
        DictClient,
        SqliteLookupClient,
        dns_filter,
        jdbc_streaming_filter,
    )

    db = _geo_db()
    mapping = {f"host-{k}": f"10.0.{k}.1" for k in range(40)}
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            F.concat(F.lit("host-"), (F.col("event_id") % 50).cast("string")).alias(
                "host"
            ),
        )
    )
    resolved = dns_filter(
        ev.withColumn("orig_host", F.col("host")),
        resolve=["host"],
        client_factory=lambda: DictClient(mapping),
        client_key="gate-dns",
    ).withColumnsRenamed({"host": "resolved_host", "orig_host": "host"})
    enriched = jdbc_streaming_filter(
        resolved,
        "host",
        "geo",
        client_factory=lambda: SqliteLookupClient(
            db, "SELECT code, region FROM geo WHERE host = ? ORDER BY region"
        ),
        client_key=f"gate-jdbc:{db}",
        value_type="array<struct<code:string,region:string>>",
        tag_on_failure=(),  # jdbc miss is data-dependent here, dns already tagged
    )
    return enriched.select(
        "event_id",
        "host",
        "resolved_host",
        F.concat_ws(",", F.coalesce("tags", F.array().cast("array<string>"))).alias(
            "fail_tags"
        ),
        F.when(F.col("geo").isNull(), F.lit(0))
        .otherwise(F.size("geo"))
        .cast("int")
        .alias("n_geo_rows"),
        F.element_at("geo", 1).getField("code").alias("first_code"),
        F.element_at("geo", 1).getField("region").alias("first_region"),
    )

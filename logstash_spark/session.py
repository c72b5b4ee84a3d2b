"""SparkSession factory with scale-oriented defaults.

The same conf set is used by tests (local[*]) and by spark-submit on a
real cluster; only master/parallelism differ. AQE is always on: it is
our runtime answer to skewed `source` keys (SURVEY.md §4 "Skew
handling") alongside explicit salting in operators.aggregate.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches for pandas UDFs: ~10k rows amortizes Python invoke cost
# without blowing executor memory on wide token arrays (SURVEY.md §4).
ARROW_BATCH = "10000"


def get_spark(
    master: str | None = None,
    app_name: str = "logstash_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None and "PYSPARK_GATEWAY_PORT" not in os.environ:
        # PYSPARK_GATEWAY_PORT is set by spark-submit's PythonRunner for
        # the driver script (PYSPARK_SUBMIT_ARGS is only the pyspark
        # shell) — when present, spark-submit owns --master and we must
        # not override it; otherwise default to all local cores
        master = "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32
    b = SparkSession.builder
    if master is not None:
        b = b.master(master)
    b = (
        b.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces shuffle reads by BYTE size, but several of our
        # stages are CPU-dense per byte: candidate verification joins
        # carry bare ids (a few MB) yet do set-intersection Jaccard per
        # row. At the default minPartitionSize (1 MB) a 4 MB candidate
        # table collapses to ~4 partitions and the verify stage runs on
        # 4 of N cores (measured: 65 s of CPU on 2 tasks / 2.2 MB in the
        # 6M-doc dedup study). 64k lets parallelismFirst actually reach
        # cluster width for these stages; truly tiny stages still
        # coalesce to one partition.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", ARROW_BATCH)
        .config("spark.sql.session.timeZone", "UTC")
        # Logstash semantics are lenient: a failed parse/cast yields null +
        # a failure tag, never a per-row exception (SURVEY.md §1.1 delta 3).
        # Spark 4 defaults ANSI on; we run non-ANSI to match.
        .config("spark.sql.ansi.enabled", "false")
        # Later duplicate key wins when building maps — exactly the
        # reference kv filter's semantics (logstash-filter-kv kv.rb:
        # repeated keys overwrite unless allow_duplicate_values). Lets
        # kv's duplicates='last' default use a single map_from_entries
        # pass instead of an O(K·D) group-by-key HOF scan.
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Cap GC parallelism: on a VM with all 32 vCPUs driving worker
        # threads, default GC thread counts (=ncpu) spin against the
        # workers — measured 17% kernel time at local[32], gone with the
        # cap (BENCH/BASELINE.md "GC contention" note).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseG1GC -XX:ParallelGCThreads=8 -XX:ConcGCThreads=2",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:+UseG1GC -XX:ParallelGCThreads=4 -XX:ConcGCThreads=2",
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()

"""Spec → DataFrame plan → multi-sink fan-out execution.

The Logstash hot loop (SURVEY.md §3.2: queue → filter datasets →
output delegators) becomes ONE lazily-planned DataFrame:

    read → parse/enrich columns → route flags → persist → per-sink
    filter + write (+ aggregate, metrics, lineage side tables)

Deliberate physical choices (SURVEY.md §4/§7.3 — the only places Spark
needs a human decision):
  * `persist()` exactly once before fan-out — Spark does not share work
    across write actions, and the parse stage is the expensive part;
  * per-sink aggregates computed from ONE `explode(routes)` frame so all
    sinks share a single shuffle instead of K groupBy jobs;
  * lineage rows derived via `spark_partition_id()` at read time;
  * resume: a deterministic `run_id` is recorded in each sink's snapshot
    lineage; a rerun skips sinks whose latest snapshot already carries
    the run_id (idempotent commit, FIXTURES.md F6).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from logstash_spark.operators import OPS
from logstash_spark.operators.route import ROUTES, add_routes, route_filter
from logstash_spark.plans.spec import PipelineSpec
from logstash_spark.sources.tableio import SnapshotTable

# operator modules register themselves in OPS on import
import logstash_spark.operators.parse  # noqa: F401, E402
import logstash_spark.operators.mutate  # noqa: F401, E402
import logstash_spark.operators.enrich  # noqa: F401, E402
import logstash_spark.operators.aggregate  # noqa: F401, E402
import logstash_spark.operators.multiplicity  # noqa: F401, E402
import logstash_spark.functions  # noqa: F401, E402


@dataclass
class RunResult:
    run_id: str
    sink_counts: dict[str, int] = field(default_factory=dict)
    skipped_sinks: list[str] = field(default_factory=list)
    aggregates: DataFrame | None = None
    metrics: DataFrame | None = None
    lineage: DataFrame | None = None


def apply_filters(df: DataFrame, spec: PipelineSpec) -> DataFrame:
    """Apply the ordered filter chain; `when`-gated filters follow
    SplitDataset semantics: op on the true branch, pass-through on the
    false branch, union back (columns align by name)."""
    from logstash_spark.operators.route import compile_condition

    for f_ in spec.filters:
        fn = OPS[f_.op]
        if f_.when is None:
            df = fn(df, **f_.conf)
        else:
            cond = compile_condition(f_.when, df)
            true_df = fn(df.where(cond), **f_.conf)
            false_df = df.where(~F.coalesce(cond, F.lit(False)))
            df = true_df.unionByName(false_df, allowMissingColumns=True)
    return df


def build_plan(df: DataFrame, spec: PipelineSpec) -> DataFrame:
    """Pure plan construction: filters + route flags. No actions."""
    df = apply_filters(df, spec)
    return add_routes(df, spec.routes, else_sink=spec.else_sink)


def _input_fingerprint(df: DataFrame, spec: PipelineSpec) -> str:
    """Deterministic run id from the input's files/plan + spec shape, so a
    restarted identical job maps to the same run (resume key)."""
    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
    basis = "|".join(files) + "||" + df.schema.simpleString() + "||" + str(spec.routes)
    return hashlib.sha256(basis.encode()).hexdigest()[:16]


def run_pipeline(
    spark: SparkSession,
    input_df: DataFrame,
    spec: PipelineSpec,
    sinks_root: str,
    *,
    resume: bool = True,
    fail_after_sink: str | None = None,  # test hook (FIXTURES.md F6)
    drop_before_write: tuple[str, ...] = (),
) -> RunResult:
    run_id = _input_fingerprint(input_df, spec)

    # per-partition lineage must be stamped BEFORE any repartitioning
    input_df = input_df.withColumn("_in_part", F.spark_partition_id())

    routed = build_plan(input_df, spec)
    routed = routed.persist(StorageLevel.MEMORY_AND_DISK)

    result = RunResult(run_id=run_id)

    # ONE job computes (sink, partition) → count for every sink's lineage
    # (previously one job per sink — K extra cache scans at scale).
    per_sink_part: dict[str, dict[int, int]] = {}
    for r in (
        routed.select(F.explode(ROUTES).alias("_sink"), "_in_part")
        .groupBy("_sink", "_in_part")
        .count()
        .collect()
    ):
        per_sink_part.setdefault(r["_sink"], {})[int(r["_in_part"])] = r["count"]

    # ---- per-sink writes (idempotent via run_id in snapshot lineage) ----
    for sink in spec.sink_names():
        table = SnapshotTable(os.path.join(sinks_root, sink))
        latest = table.latest()
        if resume and latest and latest.lineage.get("run_id") == run_id:
            result.skipped_sinks.append(sink)
            continue
        out = route_filter(routed, sink).drop(ROUTES, "_in_part", *drop_before_write)
        parts = per_sink_part.get(sink, {})
        table.append(
            out,
            lineage={
                "run_id": run_id,
                "processed_partitions": sorted(parts),
                "rows_per_partition": {str(p): c for p, c in parts.items()},
            },
            meta={"pipeline": spec.name, "sink": sink},
        )
        result.sink_counts[sink] = sum(parts.values())
        if fail_after_sink == sink:
            routed.unpersist()
            raise RuntimeError(f"injected failure after sink {sink}")

    # ---- aggregates: ONE shuffle for all sinks via explode(routes) ----
    dims = [d for d in spec.aggregate_dims if d in routed.columns]
    exploded = routed.select(
        F.explode(ROUTES).alias("sink"), *dims,
        *( [spec.aggregate_sum] if spec.aggregate_sum and spec.aggregate_sum in routed.columns else [] ),
        *( ["doc_id"] if "doc_id" in routed.columns else [] ),
    )
    aggs = [F.count("*").alias("cnt")]
    if spec.aggregate_sum and spec.aggregate_sum in routed.columns:
        aggs.append(F.sum(spec.aggregate_sum).alias(f"sum_{spec.aggregate_sum}"))
    if "doc_id" in routed.columns:
        aggs.append(F.approx_count_distinct("doc_id").alias("approx_docs"))
    agg_df = exploded.rollup("sink", *dims).agg(*aggs)
    SnapshotTable(os.path.join(sinks_root, "_aggregates")).append(
        agg_df, lineage={"run_id": run_id}
    )
    result.aggregates = agg_df

    # ---- metrics side table ----
    if spec.metrics_ts and spec.metrics_ts in routed.columns:
        from logstash_spark.operators.aggregate import metrics as metrics_op

        m = metrics_op(
            routed, spec.metrics_ts, dims, window_duration=spec.metrics_window
        )
        SnapshotTable(os.path.join(sinks_root, "_metrics")).append(
            m, lineage={"run_id": run_id}
        )
        result.metrics = m

    # ---- lineage side table: one row per input partition ----
    lineage_df = (
        routed.groupBy("_in_part")
        .agg(
            F.count("*").alias("input_rows"),
            F.sum(F.size(ROUTES)).alias("routed_rows"),
        )
        .withColumnRenamed("_in_part", "partition_id")
        .withColumn("run_id", F.lit(run_id))
    )
    SnapshotTable(os.path.join(sinks_root, "_lineage")).append(
        lineage_df, lineage={"run_id": run_id}
    )
    result.lineage = lineage_df

    routed.unpersist()
    return result

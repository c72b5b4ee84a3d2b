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
from logstash_spark.operators.common import METADATA
from logstash_spark.operators.route import ROUTES, add_routes, route_filter
from logstash_spark.plans.spec import PipelineSpec
from logstash_spark.sources.tableio import open_table

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
    # virtual `pipeline:` sinks: address → frame handed to downstream
    # pipelines (plans.graph) instead of being written to a table
    address_frames: dict[str, DataFrame] = field(default_factory=dict)


# Row-wise projection ops: output row i is a pure function of input row i
# (no windows, joins on row position, or row multiplicity changes), so a
# `when` gate compiles into a single conditional projection — ONE scan of
# the input, matching DatasetCompiler's per-batch SplitDataset caching
# without any cache. (translate/geoip/cidr join per-row against broadcast
# dicts — still row-wise.)
_ROW_PROJECTION_OPS = {
    "grok", "dissect", "date", "kv", "json", "csv", "useragent", "syslog_pri",
    "translate", "geoip", "cidr", "mutate", "fingerprint", "uuid", "bytes",
    "truncate", "urldecode", "de_dot", "range", "environment",
}


def _apply_gated_projection(df: DataFrame, fn, conf: dict, cond) -> DataFrame | None:
    """Compile `if <cond> { <op> }` into one projection: snapshot the
    pre-op value of every column, apply the op to ALL rows, then select
    if(cond, new, old) per column (null for op-created columns on the
    false branch — same shape unionByName(allowMissingColumns) gave).
    The condition itself is materialized BEFORE the op so an op that
    overwrites a referenced column cannot change the gate.

    Returns None when the op CHANGES an existing column's data type
    (e.g. `date {target == field}`, string→timestamp): the
    when/otherwise restore would implicitly cast the false branch's
    original value to the new type — a runtime CAST error under ANSI and
    silent nulls otherwise. The caller falls back to the persisted
    filter+union path, which coerces to the union-compatible common type
    exactly like the pre-compile split semantics."""
    def q(name: str):
        # backtick-quote so literal dots (de_dot's whole use case) are
        # column names, not nested-field paths
        return F.col("`" + name.replace("`", "``") + "`")

    orig_cols = list(df.columns)
    # snapshots are POSITIONAL (_pre_0, _pre_1, ...) — embedding the user
    # column name would let name-pattern ops rewrite the snapshot itself
    # (de_dot would rename _pre_a.b away and break the false-branch
    # restore)
    snap = {c: f"_pre_{i}" for i, c in enumerate(orig_cols)}
    pre = df.withColumn("_when_gate", cond)
    pre = pre.withColumns({snap[c]: q(c) for c in orig_cols})
    applied = fn(pre, **conf)
    in_types = {f.name: f.dataType for f in df.schema.fields}
    for fld in applied.schema.fields:
        if fld.name in in_types and fld.dataType != in_types[fld.name]:
            return None  # type-changing op: caller uses filter+union
    gate = F.col("_when_gate")
    out = []
    for c in applied.columns:
        if c == "_when_gate" or c.startswith("_pre_"):
            continue
        if c in orig_cols:
            out.append(F.when(gate, q(c)).otherwise(q(snap[c])).alias(c))
        else:
            out.append(F.when(gate, q(c)).alias(c))
    # columns the op dropped/renamed away still exist for FALSE-branch
    # rows (matches unionByName(allowMissingColumns) split semantics)
    for c in orig_cols:
        if c not in applied.columns:
            out.append(F.when(~gate, q(snap[c])).alias(c))
    return applied.select(*out)


def apply_filters(
    df: DataFrame,
    spec: PipelineSpec,
    persist_tracker: list[DataFrame] | None = None,
) -> DataFrame:
    """Apply the ordered filter chain; `when`-gated filters follow
    SplitDataset semantics: op on the true branch, pass-through on the
    false branch. Row-wise ops compile to a single conditional projection
    (one scan); row-multiplicity ops (split/clone/drop/aggregate...) fall
    back to filter+union over a PERSISTED input so nested conditionals
    never re-scan the source (persisted frames are appended to
    `persist_tracker` for the caller to unpersist after its action)."""
    from logstash_spark.operators.route import compile_condition

    for f_ in spec.filters:
        fn = OPS[f_.op]
        if f_.when is None:
            df = fn(df, **f_.conf)
            continue
        cond = F.coalesce(compile_condition(f_.when, df), F.lit(False))
        gated = (
            _apply_gated_projection(df, fn, f_.conf, cond)
            if f_.op in _ROW_PROJECTION_OPS
            else None
        )
        if gated is not None:
            df = gated
        else:
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            if persist_tracker is not None:
                persist_tracker.append(df)
            true_df = fn(df.where(cond), **f_.conf)
            false_df = df.where(~cond)
            df = true_df.unionByName(false_df, allowMissingColumns=True)
    return df


def build_plan(
    df: DataFrame,
    spec: PipelineSpec,
    persist_tracker: list[DataFrame] | None = None,
) -> DataFrame:
    """Pure plan construction: filters + route flags. No actions (any
    persists for gated multiplicity ops are lazy and land in
    `persist_tracker`)."""
    df = apply_filters(df, spec, persist_tracker)
    return add_routes(df, spec.routes, else_sink=spec.else_sink)


def _input_fingerprint(df: DataFrame, spec: PipelineSpec) -> str:
    """Deterministic run id from the input's files/plan + spec shape, so a
    restarted identical job maps to the same run (resume key).

    File-less inputs (generator / in-memory frames) have no inputFiles,
    which would make the id content-free — a changed `generator count`
    would silently resume against stale sinks. For those, the
    CANONICALIZED analyzed plan joins the basis (exprIds normalized by
    Spark itself, literals preserved): stable for an identical plan, a
    differing plan changes the id. Limit: an RDD-backed in-memory
    relation (createDataFrame) canonicalizes without its DATA, so two
    same-schema frames with different local rows share a plan — warned
    below; use file-backed inputs when resume must key on content."""
    try:
        files = sorted(df.inputFiles())
    except Exception:
        files = []
    plan_part = ""
    if not files:
        try:
            plan_part = (
                df._jdf.queryExecution().analyzed().canonicalized().toString()
            )
        except Exception:
            plan_part = ""  # e.g. Spark Connect: no _jdf — schema+routes only
        if "LogicalRDD" in plan_part:
            import warnings

            warnings.warn(
                "resume run_id cannot see the DATA of in-memory "
                "(createDataFrame) inputs — identical-schema reruns with "
                "different rows map to the same run; use file-backed "
                "inputs when resume must key on content",
                stacklevel=2,
            )
    basis = (
        "|".join(files) + "||" + plan_part + "||"
        + df.schema.simpleString() + "||" + str(spec.routes)
    )
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
    persist_tracker: list[DataFrame] | None = None,
    table_format: str = "auto",
) -> RunResult:
    """Execute one pipeline: build the plan, persist once, fan out to
    sinks + side tables. Virtual `pipeline:` sinks are NOT written —
    their frames land in `RunResult.address_frames` for plans.graph to
    feed downstream. When `persist_tracker` is given, cached frames are
    appended to it instead of being unpersisted here, so the fan-out
    frame stays alive until every downstream pipeline consuming this
    pipeline's address frames has run."""
    run_id = _input_fingerprint(input_df, spec)

    def _mk(name: str):
        # Iceberg on equipped clusters, parquet snapshot layout here
        return open_table(os.path.join(sinks_root, name), spark, table_format)

    # per-partition lineage must be stamped BEFORE any repartitioning
    input_df = input_df.withColumn("_in_part", F.spark_partition_id())

    persisted: list[DataFrame] = []
    routed = build_plan(input_df, spec, persisted)
    routed = routed.persist(StorageLevel.MEMORY_AND_DISK)

    result = RunResult(run_id=run_id)

    # ---- per-(sink, input-partition) lineage: written DISTRIBUTED ------
    # One job writes the (sink, partition, rows) table; only the K-row
    # per-sink totals come back to the driver. Never O(K*P) driver rows —
    # at 10^6 input partitions x 6 sinks the detail stays in the table.
    sink_lineage_df = (
        routed.select(F.explode(ROUTES).alias("sink"), "_in_part")
        .groupBy("sink", "_in_part")
        .agg(F.count("*").alias("rows"))
        .withColumnRenamed("_in_part", "partition_id")
        .withColumn("run_id", F.lit(run_id))
    )
    sl_table = _mk("_sink_lineage")
    latest_sl = sl_table.latest()
    if not (resume and latest_sl and latest_sl.lineage.get("run_id") == run_id):
        sl_table.append(sink_lineage_df, lineage={"run_id": run_id})
    totals = {
        r["sink"]: (int(r["rows"]), int(r["n_parts"]))
        for r in sl_table.read(spark)
        .where(F.col("run_id") == run_id)
        .dropDuplicates(["sink", "partition_id"])  # replays write identical rows
        .groupBy("sink")
        .agg(F.sum("rows").alias("rows"), F.count("*").alias("n_parts"))
        .collect()  # K rows (one per sink) — bounded
    }

    # ---- per-sink writes (idempotent via run_id in snapshot lineage) ----
    virtual = spec.virtual_sends()
    sink_specs = {s.name: s for s in spec.sinks}
    for sink in spec.sink_names():
        if sink in virtual:
            # pipeline-to-pipeline send: no table, just the frame; counts
            # still come from the shared explode(routes) lineage job
            result.address_frames[virtual[sink]] = route_filter(
                routed, sink
            ).drop(ROUTES, "_in_part")
            result.sink_counts[sink] = totals.get(sink, (0, 0))[0]
            continue
        table = _mk(sink)
        latest = table.latest()
        if resume and latest and latest.lineage.get("run_id") == run_id:
            result.skipped_sinks.append(sink)
            continue
        out = route_filter(routed, sink).drop(ROUTES, "_in_part", *drop_before_write)
        if sink != spec.dlq_sink:
            # [@metadata] is pipeline-scratch, never serialized
            # (Event.java §getMetadata); the DLQ keeps it — the
            # reference DLQ stores the full event for the replay reader
            out = out.drop(METADATA)
        sspec = sink_specs.get(sink)
        if sspec is not None:
            if sspec.drop_columns:
                out = out.drop(*sspec.drop_columns)
            if sspec.codec:
                # output-side `codec => ...`: serialize before the write
                from logstash_spark.plans.lscl import apply_encode_codec

                out = apply_encode_codec(out, sspec.codec, sspec.codec_conf)
        if sink == spec.dlq_sink and "tags" in out.columns:
            # DLQ entries carry failure metadata like the reference's DLQ
            # (org.logstash DLQWriter stores the event + reason): the
            # failure tags that routed the event here.
            out = out.withColumn("_dlq_reason", F.concat_ws(",", F.col("tags")))
        rows, n_parts = totals.get(sink, (0, 0))
        table.append(
            out,
            lineage={
                "run_id": run_id,
                "rows": rows,
                "n_partitions": n_parts,
                # per-partition detail lives in the _sink_lineage table,
                # keyed by (run_id, sink) — unbounded detail never enters
                # the driver-side manifest
                "detail_table": "_sink_lineage",
            },
            meta={"pipeline": spec.name, "sink": sink},
            partition_by=(sspec.partition_by or None) if sspec else None,
        )
        result.sink_counts[sink] = rows
        if fail_after_sink == sink:
            routed.unpersist()
            for p in persisted:
                p.unpersist()
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
    _mk("_aggregates").append(
        agg_df, lineage={"run_id": run_id}
    )
    result.aggregates = agg_df

    # ---- metrics side table ----
    if spec.metrics_ts and spec.metrics_ts in routed.columns:
        from logstash_spark.operators.aggregate import metrics as metrics_op

        m = metrics_op(
            routed, spec.metrics_ts, dims, window_duration=spec.metrics_window
        )
        _mk("_metrics").append(
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
    _mk("_lineage").append(
        lineage_df, lineage={"run_id": run_id}
    )
    result.lineage = lineage_df

    if persist_tracker is not None:
        # caller (plans.graph) owns cache lifetime — downstream pipelines
        # still read this pipeline's address frames
        persist_tracker.append(routed)
        persist_tracker.extend(persisted)
    else:
        routed.unpersist()
        for p in persisted:
            p.unpersist()
    return result

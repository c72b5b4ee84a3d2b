"""Correctness-gate queries, batch 13 (round 4): the `[@metadata]`
field-path convention (Event.java §getMetadata — pipeline scratch state
that feeds sprintf / conditions / mutate but is NEVER serialized) and
the LSCL `codec =>` attribute surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_spark.queries import query


@query(
    "metadata_convention",
    """
    SELECT event_id,
           event_type,
           'ev-' || event_type || '-' || CAST(event_id % 4 AS VARCHAR)
               AS idx_name,
           FALSE AS meta_leaked
    FROM events
    WHERE event_type IN ('click', 'view')
    """,
)
def metadata_convention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`[@metadata]` end-to-end through a REAL pipeline run: a mutate
    writes `[@metadata][shard]` and `[@metadata][et]`, a second mutate
    sprintf-consumes them into the serialized `idx_name`, the route
    condition reads `[@metadata][et]` — and the physical sink table must
    contain NO `@metadata` column (the reference never serializes the
    metadata map; the `meta_leaked` flag pins that schema fact into the
    value hash)."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from logstash_spark.operators.common import METADATA  # noqa: PLC0415
    from logstash_spark.plans.runner import run_pipeline  # noqa: PLC0415
    from logstash_spark.plans.spec import (  # noqa: PLC0415
        FilterSpec,
        PipelineSpec,
        SinkSpec,
    )
    from logstash_spark.sources.tableio import SnapshotTable  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type", (F.col("event_id") % 4).cast("string").alias("shard")
    )
    spec = PipelineSpec(
        name="meta_gate",
        filters=[
            FilterSpec(
                "mutate",
                {"add_field": {"[@metadata][shard]": "%{shard}",
                               "[@metadata][et]": "%{event_type}"}},
            ),
            FilterSpec(
                "mutate",
                {"add_field": {
                    "idx_name": "ev-%{[@metadata][et]}-%{[@metadata][shard]}"
                }},
            ),
        ],
        routes={
            "sink_ui": '[@metadata][et] == "click" or [@metadata][et] == "view"'
        },
        else_sink="sink_rest",
        sinks=[SinkSpec("sink_ui"), SinkSpec("sink_rest")],
        aggregate_dims=["event_type"],
        aggregate_sum=None,
        metrics_ts=None,
    )
    work = tempfile.mkdtemp(prefix="meta_gate_")
    try:
        run_pipeline(spark, ev, spec, work, resume=False)
        out = SnapshotTable(f"{work}/sink_ui").read(spark)
        rows = out.select(
            "event_id", "event_type", "idx_name",
            F.lit(METADATA in out.columns).alias("meta_leaked"),
        ).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, idx_name string, meta_leaked boolean"
    )


@query(
    "lscl_codec_pipeline",
    """
    SELECT CAST(event_id AS VARCHAR) || ',' || event_type || '-'
           || CAST(user_id AS VARCHAR) AS message
    FROM events
    """,
)
def lscl_codec_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSCL `codec =>` attributes end-to-end: events serialized to a
    json_lines TEXT file, re-ingested through a `.conf` whose file input
    declares `codec => json_lines { schema => ... }` (wire → columns),
    mutated, and written through an output whose `codec => csv` picks
    two fields — the sink table holds ONE wire-form `message` column.
    Reference: per-plugin codec config (logstash-core
    lib/logstash/config/mixin.rb) + logstash-codec-json_lines/csv."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from logstash_spark.plans.lscl import bind_input, compile_conf  # noqa: PLC0415
    from logstash_spark.plans.runner import run_pipeline  # noqa: PLC0415
    from logstash_spark.sources.tableio import SnapshotTable  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    work = tempfile.mkdtemp(prefix="lscl_codec_gate_")
    try:
        jdir = f"{work}/jsonl"
        ev.select(
            F.to_json(F.struct("event_id", "event_type", "user_id")).alias("value")
        ).write.text(jdir)
        conf = f"""
        input {{ file {{ path => "{jdir}"
          codec => json_lines {{
            schema => "event_id BIGINT, event_type STRING, user_id BIGINT" }} }} }}
        filter {{ mutate {{ add_field => {{ "idx" => "%{{event_type}}-%{{user_id}}" }} }} }}
        output {{ file {{ path => "enc"
          codec => csv {{ fields => ["event_id", "idx"] }} }} }}
        """
        spec, ast = compile_conf(conf, aggregate_dims=["event_type"])
        df = bind_input(spark, ast)
        run_pipeline(spark, df, spec, f"{work}/sinks", resume=False)
        out = SnapshotTable(f"{work}/sinks/enc").read(spark)
        assert out.columns == ["message"], out.columns
        rows = out.collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "message string")


@query(
    "lscl_env_pipeline",
    """
    SELECT event_id, event_type,
           'staging-' || event_type AS env_tag,
           'eu-1' AS region
    FROM events
    WHERE event_type = 'click'
    """,
)
def lscl_env_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`${VAR}` / `${VAR:default}` environment substitution end-to-end
    through a REAL `.conf` pipeline run (reference: docs "Using
    environment variables"; logstash-core substitution_variables.rb):
    an add_field value mixes an unset-var DEFAULT (`${..:staging}`) with
    a sprintf, a second field and the hot sink's file path both come
    from SET env vars — compile, run, gate the hot sink's contents.
    Conditions stay literal (the reference does not substitute inside
    expressions, and neither do we)."""
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from logstash_spark.plans.lscl import compile_conf  # noqa: PLC0415
    from logstash_spark.plans.runner import run_pipeline  # noqa: PLC0415
    from logstash_spark.sources.tableio import SnapshotTable  # noqa: PLC0415

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "event_type"
    )
    conf = """
    filter {
      mutate { add_field => {
        "env_tag" => "${LSCL_GATE_ENV:staging}-%{event_type}"
        "region" => "${LSCL_GATE_REGION}" } }
    }
    output {
      if [event_type] == "click" { file { path => "${LSCL_GATE_SINK}" } }
      file { path => "rest" }
    }
    """
    # hermetic: env passed explicitly (no os.environ mutation — the gate
    # may run concurrently with other queries in one driver process);
    # LSCL_GATE_ENV absent so the `:staging` default must engage
    gate_env = {"LSCL_GATE_REGION": "eu-1", "LSCL_GATE_SINK": "hot"}
    work = tempfile.mkdtemp(prefix="lscl_env_gate_")
    try:
        spec, _ = compile_conf(conf, aggregate_dims=["event_type"], env=gate_env)
        assert "hot" in spec.routes, spec.routes
        run_pipeline(spark, ev, spec, f"{work}/sinks", resume=False)
        out = SnapshotTable(f"{work}/sinks/hot").read(spark)
        rows = out.select("event_id", "event_type", "env_tag", "region").collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "event_id bigint, event_type string, env_tag string, region string"
    )

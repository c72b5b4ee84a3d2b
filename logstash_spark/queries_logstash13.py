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


@query(
    "lscl_binary_codec",
    """
    WITH pk AS (SELECT unnest(range(0, 40)) AS p),
    fl AS (
      SELECT p, CAST(gs.i AS INT) AS flow_no,
             CAST(p % 3 + 1 AS INT) AS flow_records
      FROM pk, LATERAL (SELECT unnest(range(0, p % 3 + 1)) AS i) gs
    )
    SELECT CAST(p AS BIGINT) AS flow_seq_num, flow_no, flow_records,
           '10.0.' || CAST(p AS VARCHAR) || '.' || CAST(flow_no AS VARCHAR)
             AS ipv4_src_addr,
           '192.168.1.1' AS ipv4_dst_addr,
           CAST(p * 10 + flow_no + 1 AS BIGINT) AS in_pkts,
           CAST((p * 10 + flow_no + 1) * 64 AS BIGINT) AS in_bytes,
           CAST((1700000000 + p) * 1000 - 100000 + flow_no * 1000 AS BIGINT)
             AS first_switched_ms,
           CAST(1024 + p AS INT) AS l4_src_port,
           CAST(443 AS INT) AS l4_dst_port,
           CAST(6 AS INT) AS protocol,
           CAST(1700000000 + p AS BIGINT) AS unix_sec,
           CAST(p AS VARCHAR) || '-' || CAST(flow_no AS VARCHAR) AS flow_key,
           FALSE AS meta_leaked
    FROM fl
    """,
)
def lscl_binary_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A BINARY wire codec end-to-end through `.conf` text (the r04
    verdict's remaining LSCL gap): 40 deterministic NetFlow v5 export
    packets are written as one-packet-per-file blobs, a conf declaring
    `input { file { codec => netflow } }` re-ingests them (binaryFile
    framing, numpy-vectorized decode), a mutate chain inside the SAME
    conf writes `[@metadata][pkt]` and sprintf-consumes it into
    `flow_key` (pinning parser-level `[@metadata]` support in conf
    text — reference Event.java §getMetadata + config/mixin.rb per-
    plugin codecs), and the decoded flows land in a file sink that must
    NOT contain the metadata column (`meta_leaked` pins that schema
    fact). The oracle re-derives every flow field from packet-index
    arithmetic alone — it never sees the bytes."""
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from logstash_spark.operators.common import METADATA  # noqa: PLC0415
    from logstash_spark.operators.wire import netflow_encode  # noqa: PLC0415
    from logstash_spark.plans.lscl import bind_input, compile_conf  # noqa: PLC0415
    from logstash_spark.plans.runner import run_pipeline  # noqa: PLC0415
    from logstash_spark.sources.tableio import SnapshotTable  # noqa: PLC0415

    p = F.col("id")
    pkts = netflow_encode(
        spark.range(0, 40, 1, 4),
        count=(p % 3 + 1).cast("int"),
        header={
            "sys_uptime": F.lit(3_600_000),
            "unix_secs": F.lit(1_700_000_000) + p,
            "unix_nsecs": F.lit(0),
            "flow_sequence": p,
            "engine_id": p % 4,
        },
        record={
            "srcaddr": lambda i: F.lit(167_772_160) + p * 256 + i,
            "dstaddr": F.lit(3_232_235_777),
            "dPkts": lambda i: p * 10 + i + 1,
            "dOctets": lambda i: (p * 10 + i + 1) * 64,
            "first": lambda i: F.lit(3_500_000) + i * 1000,
            "last": lambda i: F.lit(3_500_000) + i * 1000 + 500,
            "srcport": F.lit(1024) + p,
            "dstport": F.lit(443),
            "prot": F.lit(6),
        },
    ).select("id", "packet").collect()

    work = tempfile.mkdtemp(prefix="lscl_nf_gate_")
    pdir = f"{work}/packets"
    os.makedirs(pdir)
    try:
        for r in pkts:
            with open(f"{pdir}/pkt-{r['id']:04d}.nf", "wb") as fh:
                fh.write(bytes(r["packet"]))
        conf = f"""
        input {{ file {{ path => "{pdir}" codec => netflow }} }}
        filter {{
          mutate {{ add_field => {{ "[@metadata][pkt]" => "%{{flow_seq_num}}" }} }}
          mutate {{ add_field => {{
            "flow_key" => "%{{[@metadata][pkt]}}-%{{flow_no}}" }} }}
        }}
        output {{ file {{ path => "flows" }} }}
        """
        spec, ast = compile_conf(conf, aggregate_dims=["protocol"])
        df = bind_input(spark, ast)
        run_pipeline(spark, df, spec, f"{work}/sinks", resume=False)
        out = SnapshotTable(f"{work}/sinks/flows").read(spark)
        rows = out.select(
            "flow_seq_num", "flow_no", "flow_records",
            "ipv4_src_addr", "ipv4_dst_addr", "in_pkts", "in_bytes",
            "first_switched_ms", "l4_src_port", "l4_dst_port", "protocol",
            "unix_sec", "flow_key",
            F.lit(METADATA in out.columns).alias("meta_leaked"),
        ).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "flow_seq_num bigint, flow_no int, flow_records int, "
        "ipv4_src_addr string, ipv4_dst_addr string, in_pkts bigint, "
        "in_bytes bigint, first_switched_ms bigint, l4_src_port int, "
        "l4_dst_port int, protocol int, unix_sec bigint, flow_key string, "
        "meta_leaked boolean",
    )

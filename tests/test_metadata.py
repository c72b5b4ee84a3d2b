"""`[@metadata]` convention (Event.java §getMetadata): a scratch struct
readable/writable through every field-reference surface (mutate targets,
sprintf, route conditions) that is NEVER serialized to physical sinks —
the single most common LSCL idiom (index naming, temp state)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logstash_spark.operators.common import METADATA
from logstash_spark.plans.runner import run_pipeline
from logstash_spark.plans.spec import FilterSpec, PipelineSpec, SinkSpec
from logstash_spark.sources.gen import input_sequences
from logstash_spark.sources.tableio import SnapshotTable


def test_metadata_scratch_used_everywhere_but_never_written(spark, tmp_path):
    df = input_sequences(spark, 300)
    spec = PipelineSpec(
        name="meta",
        filters=[
            # write a metadata temp field from a real column
            FilterSpec("mutate", {"add_field": {"[@metadata][team]": "t-%{source}"}}),
            # consume it via sprintf into a real output field
            FilterSpec("mutate", {"add_field": {"idx_name": "logs-%{[@metadata][team]}"}}),
        ],
        # consume it in a route condition
        routes={"sink_web": '[@metadata][team] == "t-web"'},
        else_sink="sink_rest",
        sinks=[SinkSpec("sink_web"), SinkSpec("sink_rest")],
    )
    res = run_pipeline(spark, df, spec, str(tmp_path))

    n_web = df.where(F.col("source") == "web").count()
    assert res.sink_counts["sink_web"] == n_web
    assert res.sink_counts["sink_rest"] == 300 - n_web

    for sink in ("sink_web", "sink_rest"):
        out = SnapshotTable(os.path.join(str(tmp_path), sink)).read(spark)
        # the metadata struct fed sprintf + routing, yet never serialized
        assert METADATA not in out.columns, f"{sink} leaked {METADATA}"
        assert "idx_name" in out.columns
    web = SnapshotTable(os.path.join(str(tmp_path), "sink_web")).read(spark)
    assert web.select("idx_name").distinct().collect()[0][0] == "logs-t-web"


def test_metadata_struct_grows_and_unsets(spark):
    from logstash_spark.operators import mutate as M

    df = spark.createDataFrame([(1, "click")], ["id", "et"])
    df = M.add_field(df, {"[@metadata][a]": "x", "[@metadata][b]": "%{et}"})
    got = df.select(
        F.col(f"`{METADATA}`.a").alias("a"), F.col(f"`{METADATA}`.b").alias("b")
    ).collect()[0]
    assert (got.a, got.b) == ("x", "click")
    df = M.remove_field(df, ["[@metadata][a]"])
    assert [f.name for f in df.schema[METADATA].dataType.fields] == ["b"]

"""LSCL `codec =>` attribute surface (reference: per-plugin codec
config, logstash-core lib/logstash/config/mixin.rb): the codec
*operators* have existed since round 2 — these tests pin the config
path that reaches them from `.conf` text."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from logstash_spark.plans.lscl import (
    Plugin,
    bind_input,
    compile_conf,
    parse_config,
)


def test_parse_bare_and_block_codec():
    ast = parse_config(
        """
        input {
          file { path => "/tmp/x" codec => json_lines }
          file { path => "/tmp/y"
                 codec => multiline { pattern => "^\\s" what => "previous" } }
        }
        output { file { path => "out" codec => csv { fields => ["a", "b"] } } }
        """
    )
    c0 = ast.inputs[0].attrs["codec"]
    assert isinstance(c0, Plugin) and c0.name == "json_lines" and c0.attrs == {}
    c1 = ast.inputs[1].attrs["codec"]
    assert c1.name == "multiline"
    assert c1.attrs["pattern"] == "^\\s" and c1.attrs["what"] == "previous"
    co = ast.outputs[0].attrs["codec"]
    assert co.name == "csv" and co.attrs["fields"] == ["a", "b"]


def test_file_input_json_lines_codec_binds(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.jsonl").write_text('{"k": 1, "v": "x"}\n{"k": 2, "v": "y"}\n')
    ast = parse_config(
        f'input {{ file {{ path => "{p}" '
        'codec => json_lines { schema => "k INT, v STRING" } } }'
    )
    df = bind_input(spark, ast)
    got = {r.k: r.v for r in df.select("k", "v").collect()}
    assert got == {1: "x", 2: "y"}


def test_file_input_multiline_codec_binds(spark, tmp_path):
    p = tmp_path / "logs"
    p.mkdir()
    (p / "app.log").write_text(
        "EVT one\n  at frame1\n  at frame2\nEVT two\n  at frame3\n"
    )
    ast = parse_config(
        f'input {{ file {{ path => "{p}" '
        'codec => multiline { pattern => "^\\s" what => "previous" } } }'
    )
    df = bind_input(spark, ast)
    msgs = sorted(r.message for r in df.select("message").collect())
    assert msgs == [
        "EVT one\n  at frame1\n  at frame2",
        "EVT two\n  at frame3",
    ]


def test_file_input_gzip_lines_codec_binds(spark, tmp_path):
    p = tmp_path / "gz"
    p.mkdir()
    (p / "a.gz").write_bytes(gzip.compress(b"l1\nl2\n"))
    ast = parse_config(
        f'input {{ file {{ path => "{p}" codec => gzip_lines }} }}'
    )
    df = bind_input(spark, ast)
    assert sorted(r.message for r in df.select("message").collect()) == ["l1", "l2"]


def test_output_codec_serializes_sink(spark, tmp_path):
    """A `.conf` whose output declares `codec => csv` writes ONE message
    column in wire form, not the raw event columns."""
    from logstash_spark.plans.runner import run_pipeline
    from logstash_spark.sources.tableio import SnapshotTable

    conf = """
    filter { mutate { add_field => { "flag" => "f-%{et}" } } }
    output {
      file { path => "enc" codec => csv { fields => ["id", "flag"] } }
    }
    """
    spec, _ = compile_conf(conf, aggregate_dims=["et"])
    df = spark.createDataFrame([(1, "a"), (2, "b,c")], ["id", "et"])
    run_pipeline(spark, df, spec, str(tmp_path))
    out = SnapshotTable(os.path.join(str(tmp_path), "enc")).read(spark)
    assert out.columns == ["message"]
    got = sorted(r.message for r in out.collect())
    # RFC-4180: the flag containing a comma is quoted
    assert got == ["1,f-a", '2,"f-b,c"']


def test_output_json_lines_codec(spark, tmp_path):
    from logstash_spark.plans.runner import run_pipeline
    from logstash_spark.sources.tableio import SnapshotTable

    conf = 'output { file { path => "j" codec => json_lines } }'
    spec, _ = compile_conf(conf, aggregate_dims=["et"])
    df = spark.createDataFrame([(7, "x")], ["id", "et"])
    run_pipeline(spark, df, spec, str(tmp_path))
    out = SnapshotTable(os.path.join(str(tmp_path), "j")).read(spark)
    import json

    assert json.loads(out.collect()[0].message) == {"id": 7, "et": "x"}

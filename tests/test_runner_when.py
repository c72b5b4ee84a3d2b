"""`when`-gated filter compilation (DatasetCompiler §splitDataset analog):
row-wise ops must compile to ONE conditional projection (single source
scan), multiplicity ops fall back to filter+union over a persisted input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logstash_spark.plans.runner import apply_filters
from logstash_spark.plans.spec import FilterSpec, PipelineSpec


def _spec(filters):
    return PipelineSpec(name="t", filters=filters, routes={})


def _scan_count(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Scan parquet")


def test_gated_rowwise_op_scans_source_once(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "alpha beta", "app"), (2, "gamma delta", "web"), (3, "x", "app")],
        ["id", "msg", "source"],
    ).write.parquet(src)
    df = spark.read.parquet(src)
    spec = _spec([
        FilterSpec(
            op="mutate", conf={"uppercase": ["msg"]}, when='[source] == "app"'
        )
    ])
    out = apply_filters(df, spec)
    assert _scan_count(out) == 1  # single projection, no split+union re-scan
    rows = {r["id"]: r["msg"] for r in out.collect()}
    assert rows == {1: "ALPHA BETA", 2: "gamma delta", 3: "X"}


def test_gated_op_new_columns_null_on_false_branch(spark):
    df = spark.createDataFrame(
        [("a=1 b=2", "app"), ("a=9 b=8", "web")], ["m", "source"]
    )
    spec = _spec([
        FilterSpec(
            op="kv", conf={"field": "m", "include_keys": ["a", "b"]},
            when='[source] == "app"',
        )
    ])
    out = apply_filters(df, spec).collect()
    by_src = {r["source"]: r for r in out}
    assert by_src["app"]["a"] == "1" and by_src["app"]["b"] == "2"
    assert by_src["web"]["a"] is None and by_src["web"]["b"] is None


def test_gate_condition_frozen_before_op_overwrites_field(spark):
    """The gate must evaluate against the PRE-op value even when the op
    overwrites the very column the condition references."""
    df = spark.createDataFrame([("app",), ("web",)], ["source"])
    spec = _spec([
        FilterSpec(
            op="mutate", conf={"replace": {"source": "SEEN"}},
            when='[source] == "app"',
        )
    ])
    vals = sorted(r["source"] for r in apply_filters(df, spec).collect())
    assert vals == ["SEEN", "web"]


def test_gated_multiplicity_op_filter_union_semantics(spark):
    """Row-multiplicity ops (clone) cannot be a projection: the fallback
    filter+union path must persist the input and produce correct rows."""
    df = spark.createDataFrame(
        [(1, "app"), (2, "web")], ["id", "source"]
    ).withColumn("type", F.lit("orig"))
    tracker = []
    spec = _spec([
        FilterSpec(op="clone", conf={"types": ["copy"]}, when='[source] == "app"')
    ])
    out = apply_filters(df, spec, tracker).collect()
    assert len(tracker) == 1  # input persisted before the split
    for t in tracker:
        t.unpersist()
    got = sorted((r["id"], r["type"]) for r in out)
    assert got == [(1, "copy"), (1, "orig"), (2, "orig")]


def test_gated_rename_keeps_old_column_for_false_branch(spark):
    """mutate rename under a gate: renamed column for matching rows, the
    ORIGINAL column survives (null on the true branch) for the rest —
    exactly what the filter+union split would produce."""
    df = spark.createDataFrame([(1, "app", "x"), (2, "web", "y")],
                               ["id", "source", "old"])
    spec = _spec([
        FilterSpec(op="mutate", conf={"rename": {"old": "new"}},
                   when='[source] == "app"')
    ])
    rows = {r["id"]: r for r in apply_filters(df, spec).collect()}
    assert rows[1]["new"] == "x" and rows[1]["old"] is None
    assert rows[2]["new"] is None and rows[2]["old"] == "y"


def test_nested_gates_still_single_scan(spark, tmp_path):
    src = str(tmp_path / "src2")
    spark.createDataFrame(
        [(i, f"m{i}", "app" if i % 2 else "web") for i in range(10)],
        ["id", "msg", "source"],
    ).write.parquet(src)
    df = spark.read.parquet(src)
    spec = _spec([
        FilterSpec(op="mutate", conf={"uppercase": ["msg"]}, when='[source] == "app"'),
        FilterSpec(op="mutate", conf={"add_field": {"tier": "hot"}}, when='[id] > 5'),
        FilterSpec(op="fingerprint", conf={"source": "msg"}, when='[source] == "web"'),
    ])
    out = apply_filters(df, spec)
    assert _scan_count(out) == 1
    assert out.count() == 10


def test_fileless_input_run_id_tracks_content(spark):
    """A generator input with a different count must get a different
    run_id (file-less inputs hash the normalized analyzed plan), while
    identical rebuilds map to the same id (resume key)."""
    from logstash_spark.plans.runner import _input_fingerprint
    from logstash_spark.sources.gen import input_sequences

    spec = _spec([])
    a1 = _input_fingerprint(input_sequences(spark, 100), spec)
    a2 = _input_fingerprint(input_sequences(spark, 100), spec)
    b = _input_fingerprint(input_sequences(spark, 200), spec)
    assert a1 == a2
    assert a1 != b


def test_gated_type_changing_op_falls_back_to_split(spark):
    """A gated op that rewrites an existing column's TYPE (date with
    target==field, string→timestamp) must not compile to the conditional
    projection — the when/otherwise restore would cast the false branch's
    original string to timestamp (ANSI runtime error / silent nulls).
    The filter+union fallback coerces to the common type instead."""
    df = spark.createDataFrame(
        [(1, "app", "2024-01-02 03:04:05"), (2, "web", "not a date at all!")],
        ["id", "source", "ts"],
    )
    tracker = []
    spec = _spec([
        FilterSpec(
            op="date",
            conf={"field": "ts", "formats": ["yyyy-MM-dd HH:mm:ss"], "target": "ts"},
            when='[source] == "app"',
        )
    ])
    rows = {r["id"]: r for r in apply_filters(df, spec, tracker).collect()}
    assert len(tracker) == 1  # fell back to the persisted split path
    for t in tracker:
        t.unpersist()
    assert str(rows[1]["ts"]).startswith("2024-01-02 03:04:05")
    # false branch keeps the original value verbatim (no cast, no null)
    assert rows[2]["ts"] == "not a date at all!"


def test_gated_de_dot_on_dotted_columns(spark):
    """The de_dot-under-a-gate case end-to-end: dotted column renamed on
    the true branch, original survives for the false branch; the
    positional _pre_ snapshots are immune to de_dot's name rewriting."""
    df = spark.createDataFrame([(1, "app", "x"), (2, "web", "y")],
                               ["id", "source", "a.b"])
    spec = _spec([
        FilterSpec(op="de_dot", conf={}, when='[source] == "app"')
    ])
    rows = {r["id"]: r for r in apply_filters(df, spec).collect()}
    assert rows[1]["a_b"] == "x" and rows[1]["a.b"] is None
    assert rows[2]["a_b"] is None and rows[2]["a.b"] == "y"

"""E2E pipeline oracle (FIXTURES.md F1/F3/F5/F6): closed-form per-sink
counts computed independently in Python from the generation rules,
per-row token-array equality through the pipeline, and the resume /
no-duplicates contract — the pytest analogs of Logstash's
qa/integration count assertions (SURVEY.md §5).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logstash_spark.plans.flagship import run_flagship
from logstash_spark.sources.gen import input_sequences
from logstash_spark.sources.tableio import SnapshotTable

N = 2000


def _expected(n: int) -> dict[str, int]:
    """Closed-form re-derivation of the route counts from gen.py rules."""
    counts = {s: 0 for s in ["sink_errors", "sink_edge", "sink_service", "sink_rest", "dlq"]}
    for i in range(n):
        malformed = i % 211 == 0
        m = i % 100
        if m < 55:
            source = "web"
        elif m < 80:
            source = "app"
        elif m < 90:
            source = "syslog"
        elif m < 96:
            source = "db"
        elif m < 99:
            source = "crawler"
        else:
            source = "iot"
        src_class = {"web": "edge", "app": "service", "syslog": "infra",
                     "db": "infra", "crawler": "batch"}.get(source, "unknown")
        lvl_mod = i % 9
        level = ("ERROR" if lvl_mod == 0 else "INFO" if lvl_mod <= 4
                 else "WARN" if lvl_mod <= 6 else "DEBUG")
        if malformed:
            level = None  # grok failed; level never extracted
        if level == "ERROR" or malformed:
            counts["sink_errors"] += 1
        if malformed:
            counts["dlq"] += 1
        edge = src_class == "edge" and level != "DEBUG"  # null != DEBUG → True
        service = src_class == "service"
        if edge:
            counts["sink_edge"] += 1
        if service:
            counts["sink_service"] += 1
        if not edge and not service:
            counts["sink_rest"] += 1
    return counts


@pytest.fixture(scope="module")
def run(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sinks"))
    df = input_sequences(spark, N)
    res = run_flagship(spark, df, root)
    return root, res


def test_per_sink_counts_match_closed_form(run):
    _, res = run
    assert res.sink_counts == _expected(N)


def test_token_array_equality_through_pipeline(spark, run):
    """The north rule's per-row invariant: tokens reach every sink
    byte-identical. Anti-join on (doc_id, tokens) must be empty."""
    root, _ = run
    inp = input_sequences(spark, N).select("doc_id", "tokens")
    for sink in ["sink_edge", "sink_service", "sink_errors", "sink_rest", "dlq"]:
        out = SnapshotTable(os.path.join(root, sink)).read(spark)
        missing = out.select("doc_id", "tokens").exceptAll(inp).count()
        assert missing == 0, f"{sink} has mutated token arrays"


def test_dlq_rows_carry_failure_reason(spark, run):
    """DLQ entries carry the failure tags that routed them (the
    reference DLQ's reason metadata)."""
    root, _ = run
    dlq = SnapshotTable(os.path.join(root, "dlq")).read(spark)
    assert "_dlq_reason" in dlq.columns
    assert dlq.where(~F.col("_dlq_reason").contains("_grokparsefailure")).count() == 0


def test_fanout_multiplicity(spark, run):
    """An event may reach several sinks (graph fan-out, not first-match)."""
    root, res = run
    total_routed = sum(res.sink_counts.values())
    assert total_routed > N  # fan-out strictly duplicates some rows
    # sink_edge ∩ sink_errors nonempty: web ERROR rows go to both
    edge = SnapshotTable(os.path.join(root, "sink_edge")).read(spark)
    errors = SnapshotTable(os.path.join(root, "sink_errors")).read(spark)
    both = edge.select("doc_id").intersect(errors.select("doc_id")).count()
    assert both > 0


def test_aggregate_table_consistency(spark, run):
    root, res = run
    agg = SnapshotTable(os.path.join(root, "_aggregates")).read(spark)
    per_sink = {
        r["sink"]: r["cnt"]
        for r in agg.where(
            F.col("sink").isNotNull()
            & F.col("source").isNull()
            & F.col("source_class").isNull()
        ).collect()
    }
    assert per_sink == res.sink_counts


def test_metrics_side_table(spark, run):
    root, _ = run
    m = SnapshotTable(os.path.join(root, "_metrics")).read(spark)
    # N seconds of events → ceil(N/300) five-minute windows; count sums to
    # rows with a parsed event_ts (malformed rows have none)
    total = m.agg(F.sum("cnt")).collect()[0][0]
    malformed = len([i for i in range(N) if i % 211 == 0])
    assert total == N - malformed
    assert m.where(F.col("rate_per_sec") <= 0).count() == 0


def test_lineage_per_partition(spark, run):
    root, _ = run
    lin = SnapshotTable(os.path.join(root, "_lineage")).read(spark)
    rows = lin.collect()
    assert {r["partition_id"] for r in rows} == set(range(len(rows)))
    assert sum(r["input_rows"] for r in rows) == N


def test_processed_partitions_watermark(spark, run):
    """The resume API reads per-partition lineage back from the
    _sink_lineage detail table: every input partition that routed at
    least one row to the sink appears in the watermark set."""
    root, res = run
    t = SnapshotTable(os.path.join(root, "sink_errors"))
    parts = t.processed_partitions(spark)
    lin = SnapshotTable(os.path.join(root, "_lineage")).read(spark)
    n_parts = lin.count()
    assert parts, "watermark must be non-empty after a committed run"
    assert parts <= set(range(n_parts))
    # unknown run_id → empty set
    assert t.processed_partitions(spark, run_id="nope") == set()


def test_resume_skips_committed_sinks_no_duplicates(spark, tmp_path):
    """FIXTURES.md F6: crash after first sink commit → restart → every sink
    has exactly one copy of its rows."""
    root = str(tmp_path)
    df = input_sequences(spark, 500)
    with pytest.raises(RuntimeError, match="injected failure"):
        run_flagship(spark, df, root, fail_after_sink="sink_errors")
    res = run_flagship(spark, df, root)  # restart, same input
    assert "sink_errors" in res.skipped_sinks
    exp = _expected(500)
    for sink, want in exp.items():
        t = SnapshotTable(os.path.join(root, sink)).read(spark)
        assert t.count() == want, sink
        assert t.select("doc_id").distinct().count() == t.count(), f"dups in {sink}"


def test_rerun_is_fully_idempotent(spark, tmp_path):
    root = str(tmp_path)
    df = input_sequences(spark, 300)
    run_flagship(spark, df, root)
    res2 = run_flagship(spark, df, root)
    assert sorted(res2.skipped_sinks) == sorted(_expected(300).keys())


def test_dlq_replay_loop_closes(spark, run):
    """DLQ loop closure (logstash-input-dead_letter_queue /
    DeadLetterQueueReader.java): corrupt rows → dlq sink → re-ingest via
    the dead_letter_queue source → FIXED parse succeeds → counts
    reconcile with the closed-form malformed count."""
    from logstash_spark.operators.parse import grok
    from logstash_spark.sources.dlq import dead_letter_queue

    root, res = run
    n_malformed = _expected(N)["dlq"]

    replay = dead_letter_queue(
        spark,
        os.path.join(root, "dlq"),
        reason_filter="_grokparsefailure",
        clear_tags=["_grokparsefailure"],
    )
    assert replay.count() == res.sink_counts["dlq"] == n_malformed
    assert "_dlq_reason" not in replay.columns
    # tags cleared → downstream failure checks re-run cleanly
    assert replay.where(F.array_contains("tags", "_grokparsefailure")).count() == 0

    # the "fix": a parser that understands the truncated line shape
    # (raw was dropped before the sink write; re-derive it from doc_id,
    # matching the generator's truncation rule)
    fixed = replay.withColumn(
        "raw2", F.lit("2026-01-01T00:")  # what the truncated lines carry
    )
    reparsed = grok(fixed, "raw2", r"^%{YEAR:y:int}-%{MONTHNUM2:mo}")
    ok = reparsed.where(~F.array_contains("tags", "_grokparsefailure"))
    assert ok.count() == n_malformed  # every replayed event now parses
    assert ok.select(F.min("y"), F.max("y")).collect()[0] == (2026, 2026)


def test_dlq_reason_filter_is_exact_member(spark, tmp_path):
    """reason_filter matches a whole tag in the comma-joined list, not a
    substring — `_x` variants must not be selected."""
    from logstash_spark.sources.dlq import dlq_replay_frame

    df = spark.createDataFrame(
        [(1, "_grokparsefailure"), (2, "_grokparsefailure_x"),
         (3, "_dateparsefailure,_grokparsefailure")],
        ["id", "_dlq_reason"],
    )
    out = dlq_replay_frame(df, reason_filter="_grokparsefailure", strip_metadata=False)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


class TestTableFactory:
    def test_auto_falls_back_to_snapshot_without_iceberg(self, spark, tmp_path):
        from logstash_spark.sources.tableio import (
            SnapshotTable,
            iceberg_available,
            open_table,
        )

        # this sandbox has no iceberg-spark-runtime jar
        assert not iceberg_available(spark)
        t = open_table(str(tmp_path / "t"), spark, "auto")
        assert isinstance(t, SnapshotTable)
        assert isinstance(open_table(str(tmp_path / "t2")), SnapshotTable)

    def test_explicit_iceberg_raises_without_runtime(self, spark, tmp_path):
        from logstash_spark.sources.tableio import open_table

        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            open_table(str(tmp_path / "t"), spark, "iceberg")
        with pytest.raises(ValueError, match="requires a SparkSession"):
            open_table(str(tmp_path / "t"), None, "iceberg")
        with pytest.raises(ValueError, match="unknown table format"):
            open_table(str(tmp_path / "t"), spark, "delta")

    def test_run_pipeline_explicit_snapshot_format(self, spark, tmp_path):
        # table_format="snapshot" pins the fallback explicitly — same
        # results as the default auto path in this sandbox
        from logstash_spark.plans.runner import run_pipeline
        from logstash_spark.plans.spec import PipelineSpec

        df = spark.createDataFrame(
            [(i, f"m{i}", "app" if i % 2 else "web") for i in range(20)],
            ["id", "message", "source"],
        )
        spec = PipelineSpec(
            name="t",
            filters=[],
            routes={"sink_app": '[source] == "app"',
                    "sink_web": '[source] == "web"'},
        )
        res = run_pipeline(
            spark, df, spec, str(tmp_path / "sinks"), table_format="snapshot"
        )
        assert res.sink_counts == {"sink_app": 10, "sink_web": 10}

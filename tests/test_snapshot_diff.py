"""snapshot_diff CDC + SnapshotTable.read_changes: hand-replayed
change sets and the incremental-read seam."""

from __future__ import annotations

from logstash_spark.sources.tableio import SnapshotTable, snapshot_diff


def test_snapshot_diff_changes(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")],
        "doc_id bigint, text string, source string",
    )
    new = spark.createDataFrame(
        [(2, "b", "y"), (3, "C", "z"), (4, "d", "w")],
        "doc_id bigint, text string, source string",
    )
    got = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert got[1].change == "delete"
    assert got[1].text is None  # no new-side payload for deletes
    assert got[3].change == "update"
    assert got[3].text == "C"  # payload is the NEW version
    assert got[4].change == "insert"
    assert 2 not in got  # unchanged filtered by default


def test_snapshot_diff_include_unchanged_and_cols(spark):
    old = spark.createDataFrame(
        [(1, "a", "x")], "doc_id bigint, text string, source string"
    )
    new = spark.createDataFrame(
        [(1, "a", "CHANGED")], "doc_id bigint, text string, source string"
    )
    # comparing only text: the source change is invisible
    got = snapshot_diff(
        old, new, compare_cols=["text"], include_unchanged=True
    ).collect()
    assert [(r.doc_id, r.change) for r in got] == [(1, "unchanged")]
    # comparing all shared non-id cols: it is an update
    got2 = snapshot_diff(old, new).collect()
    assert [(r.doc_id, r.change) for r in got2] == [(1, "update")]


def test_read_changes_between_snapshots(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "docs"))
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id bigint, text string"
    )
    s1 = t.append(b1)
    b2 = spark.createDataFrame([(3, "c")], "doc_id bigint, text string")
    s2 = t.append(b2)
    got = t.read_changes(spark, s1.snapshot_id, s2.snapshot_id).collect()
    # append semantics: snapshot 2 = batch1 files + batch2 → delta is
    # exactly the new batch
    assert [(r.doc_id, r.change, r.text) for r in got] == [(3, "insert", "c")]


def test_snapshot_diff_null_safe_fingerprint(spark):
    # (NULL, 'x') vs ('x', NULL) must NOT collide (concat_ws would
    # silently skip the NULL and call both rows md5('x'))
    old = spark.createDataFrame(
        [(1, None, "x")], "doc_id bigint, a string, b string"
    )
    new = spark.createDataFrame(
        [(1, "x", None)], "doc_id bigint, a string, b string"
    )
    got = snapshot_diff(old, new).collect()
    assert [(r.doc_id, r.change) for r in got] == [(1, "update")]
    # separator injection: ('a\x1fb', '') vs ('a', 'b\x1f')
    old2 = spark.createDataFrame(
        [(1, "a\x1fb", "")], "doc_id bigint, a string, b string"
    )
    new2 = spark.createDataFrame(
        [(1, "a", "b\x1f")], "doc_id bigint, a string, b string"
    )
    got2 = snapshot_diff(old2, new2).collect()
    assert [(r.doc_id, r.change) for r in got2] == [(1, "update")]


def test_snapshot_diff_ids_only_mode(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, "c")], "doc_id bigint, text string"
    )
    got = sorted(
        snapshot_diff(old, new, carry_payload=False).collect(),
        key=lambda r: r.doc_id,
    )
    assert [tuple(r) for r in got] == [
        (1, "delete"), (2, "update"), (3, "insert")
    ]
    assert got[0].__fields__ == ["doc_id", "change"]  # no payload cols

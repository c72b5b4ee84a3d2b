"""Round-5 registry fold mechanism (logstash_spark/queries_folds.py):
index-join folds must be exactly as strong as running their sub-gates
separately — every sub value appears in the fold output, alignment is
deterministic, and a drifted sub schema fails loudly.
"""

from __future__ import annotations

import pytest

from logstash_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def _fold_items():
    out = []
    for name, fn in QUERIES.items():
        d = fn.__defaults__
        if (
            d
            and isinstance(d[0], list)
            and d[0]
            and isinstance(d[0][0], tuple)
            and len(d[0][0]) == 5
        ):
            out.append((name, d[0]))
    return out


FOLDS = _fold_items()


def test_fold_inventory_and_registry_consistency():
    assert len(FOLDS) == 34
    sub_names = [s for _, subs in FOLDS for (s, *_rest) in subs]
    assert len(sub_names) == len(set(sub_names)) == 78
    # subs were popped: never both a member and a live registry entry
    for s in sub_names:
        assert s not in QUERIES and s not in ORACLES, s
    # every fold has an oracle and unique prefixes within itself
    for name, subs in FOLDS:
        assert name in ORACLES
        pfx = [p for (_s, _f, _sql, p, _c) in subs]
        assert len(set(pfx)) == len(pfx), (name, pfx)


def test_fold_oracle_mentions_every_sub_column():
    for name, subs in FOLDS:
        sql = ORACLES[name]
        for _s, _f, _sub_sql, pfx, cols in subs:
            for c in cols:
                assert f"{pfx}{c}" in sql, (name, pfx, c)


def test_fold_contains_exact_sub_values(spark):
    """The fold output must hold the sub-result's full value multiset
    under the prefix rename (index-join folds summarize nothing)."""
    name, subs = next(f for f in FOLDS if f[0] == "vocab_scaling_laws")
    fold_df = QUERIES[name](spark, SF)
    for _s, fn, _sql, pfx, cols in subs:
        sub_rows = sorted(
            tuple(r[c] for c in cols) for r in fn(spark, SF).collect()
        )
        got = sorted(
            tuple(r[pfx + c] for c in cols)
            for r in fold_df.collect()
            if r[pfx + cols[0]] is not None
            or any(r[pfx + c] is not None for c in cols)
        )
        assert got == sub_rows, (name, _s)


def test_fold_schema_drift_fails_loudly(spark):
    from logstash_spark.queries_folds import fold

    QUERIES["_drift_probe"] = lambda s, d: s.range(1)
    ORACLES["_drift_probe"] = "SELECT 1 AS id"
    QUERIES["_drift_probe2"] = lambda s, d: s.range(1)
    ORACLES["_drift_probe2"] = "SELECT 1 AS id"
    try:
        fold(
            "_drift_fold",
            [("_drift_probe", "a_", ["wrong_col"]),
             ("_drift_probe2", "b_", ["id"])],
            "test",
        )
        with pytest.raises(AssertionError):
            QUERIES["_drift_fold"](spark, SF)
    finally:
        for k in ("_drift_fold", "_drift_probe", "_drift_probe2"):
            QUERIES.pop(k, None)
            ORACLES.pop(k, None)

"""Behavioral tests for metrics_ewma (decay over idle ticks) and the
aggregate_map grouped-map escape hatch (arbitrary per-task pandas state).
"""

from __future__ import annotations

import math
from datetime import datetime

from logstash_spark.operators.aggregate import aggregate_map, metrics_ewma


def test_ewma_decays_over_idle_ticks(spark):
    """A burst then silence: rate_1m must peak at the burst tick and decay
    geometrically by (1-alpha) per idle minute afterwards."""
    rows = [("m", datetime(2024, 1, 1, 0, 0, i)) for i in range(30)]  # 30 events, tick 0
    rows += [("m", datetime(2024, 1, 1, 0, 5, 0))]  # one event 5 min later
    df = spark.createDataFrame(rows, ["meter", "ts"])
    out = {
        r["window_start"].minute: r
        for r in metrics_ewma(df, "ts", ["meter"], horizon=15).collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4, 5]  # dense grid covers idle ticks
    alpha = 1.0 - math.exp(-1.0)
    assert abs(out[0]["rate_1m"] - round(alpha * 30 / 60, 6)) < 1e-9
    # idle minute: no new weight, previous contribution decays by (1-alpha)
    assert abs(out[1]["rate_1m"] - round(out[0]["rate_1m"] * (1 - alpha), 4)) < 1e-4
    assert out[4]["rate_1m"] < out[1]["rate_1m"]
    assert out[1]["cnt"] == 0 and out[5]["cnt"] == 1
    # longer periods decay slower
    assert out[4]["rate_15m"] > out[4]["rate_1m"]


def test_aggregate_map_arbitrary_state(spark):
    """Custom pandas state logic the fixed agg builders can't express:
    longest gap between consecutive events per task."""
    import pandas as pd

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0)),
        ("a", datetime(2024, 1, 1, 0, 0, 10)),
        ("a", datetime(2024, 1, 1, 0, 1, 0)),   # 50s gap — the max
        ("b", datetime(2024, 1, 1, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, ["task", "ts"])

    def longest_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        gaps = pdf["ts"].diff().dropna()
        mx = gaps.max() // pd.Timedelta(seconds=1) if len(gaps) else 0
        return pd.DataFrame({"task": [pdf["task"].iloc[0]], "max_gap_s": [int(mx)]})

    out = {
        r["task"]: r["max_gap_s"]
        for r in aggregate_map(
            df, "task", longest_gap, "task string, max_gap_s bigint", sort_by=("ts",)
        ).collect()
    }
    assert out == {"a": 50, "b": 0}

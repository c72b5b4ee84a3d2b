#!/usr/bin/env python
"""Shared-box attribution probe for the flagship scaling studies.

Question: when [4,4] (16 cores) underperforms 4x the [1,4] (4-core)
rate, is the loss in the ENGINE (inter-executor coordination, shuffle,
scheduling) or in the BOX (memory bandwidth / turbo headroom shared by
every core)?

Method: run FOUR completely independent local-cluster[1,4] flagship
jobs AT THE SAME TIME (disjoint JVMs, no shared Spark state, each its
own 6M-row slice — same per-core work as one 24M-row e4 run) and sum
their throughputs. Any deficit of that aggregate vs 4x the SOLO [1,4]
rate is pure box effect — there is no coordination to blame across
independent clusters. Then eff_box = aggregate / (4 x solo); the
engine's own coordination cost is eff_e4 / eff_box.

Usage: python BENCH/concurrent_probe.py [N_PER_JOB=6000000]
Prints one JSON line; append interpretation to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import os
n = int(sys.argv[1]); reps = int(sys.argv[2])
os.environ["SPARK_GRAFT_CPUS"] = "4"
from logstash_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local-cluster[1,4,4096]", shuffle_partitions=4,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.driver.memory": "4g",
                               "spark.executor.memory": "4g"}})
spark.sparkContext.setLogLevel("ERROR")
from logstash_spark.sources.gen import input_sequences
from logstash_spark.plans.flagship import build_flagship
df = input_sequences(spark, n, partitions=32)
routed = build_flagship(df)
agg = (routed.select(F.explode("routes").alias("sink"), "source", "n_tok")
       .groupBy("sink", "source")
       .agg(F.count("*").alias("cnt"), F.sum("n_tok").alias("sum_n_tok")))
def run_job():
    agg.write.format("noop").mode("overwrite").save()
run_job()  # warm
best = None
for _ in range(reps):
    t0 = time.perf_counter(); run_job(); w = time.perf_counter() - t0
    best = w if best is None or w < best else best
print(json.dumps({{"sec": best, "rows_per_sec": n / best}}))
"""


def spawn() -> subprocess.Popen:
    child = CHILD.format(repo=REPO)
    return subprocess.Popen(
        [sys.executable, "-c", child, str(N), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )


def result(p: subprocess.Popen) -> dict:
    out, _ = p.communicate(timeout=1800)
    for line in reversed(out.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError("no result line")


def main() -> None:
    # solo baseline: one [1,4] job alone on the box
    solo = result(spawn())
    # aggregate: four independent [1,4] jobs simultaneously
    t0 = time.time()
    procs = [spawn() for _ in range(4)]
    rs = [result(p) for p in procs]
    agg = sum(r["rows_per_sec"] for r in rs)
    # second solo to bracket epoch drift
    solo2 = result(spawn())
    solo_best = max(solo["rows_per_sec"], solo2["rows_per_sec"])
    print(json.dumps({
        "n_per_job": N,
        "solo_1x4_rows_per_sec": round(solo["rows_per_sec"]),
        "solo_1x4_after_rows_per_sec": round(solo2["rows_per_sec"]),
        "concurrent_each": [round(r["rows_per_sec"]) for r in rs],
        "concurrent_aggregate_rows_per_sec": round(agg),
        "eff_box_vs_4x_solo": round(agg / (4 * solo_best), 3),
        "wall_concurrent_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()

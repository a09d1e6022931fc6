#!/usr/bin/env python
"""Controlled A/B of the round-5 CC barrier fusion, immune to host drift.

The 8-vs-32 scaling harness (`bench_cc_r5.py`) is epoch-noise-dominated
this round (no-Spark control unit swings 9x across blocks —
`BENCH/cc_scaling_r5.json` documents it), so this bench isolates the
actual round-5 change in ONE local[32] JVM on the SAME cached edge
table, interleaved old/new trials:

- OLD (round-4 shape): each star round runs TWO driver-synchronized
  jobs — an eager localCheckpoint materialization, then the convergence
  aggregate over the checkpointed result.
- NEW (round-5 engine code): the round's result is localCheckpoint-ed
  NON-eagerly and materialized BY the convergence aggregate — one job
  per round.

Both run the pure distributed loop (no tail cutoff) and must produce
identical (n_nodes, k_comps). Writes BENCH/cc_fusion_ab_r5.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gdal_scripts_spark import graph  # noqa: E402
from gdal_scripts_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

os.environ["SPARK_GRAFT_DRIVER_MEM"] = "32g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name="cc_fusion_ab", cpus=32, shuffle_partitions=64,
                  extra_conf=extra)

nodes = N // 3
raw = spark.range(0, N, 1, 128).select(
    F.pmod(F.xxhash64("id", F.lit(7)), F.lit(nodes)).alias("src"),
    F.pmod(F.xxhash64("id", F.lit(11)), F.lit(nodes)).alias("dst"),
)
und = raw.select(
    F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
).filter(F.col("a") != F.col("b")).persist()
und.count()


def run_old() -> tuple[float, int, int]:
    """Round-4 loop shape: eager checkpoint + separate agg per round."""
    t0 = time.time()
    cur = und.localCheckpoint()
    rounds = 0
    for _ in range(50):
        nxt = graph._small_star(graph._large_star(cur)).localCheckpoint()
        cur.unpersist()
        cur = nxt
        rounds += 1
        n, d = cur.agg(
            F.count("*").alias("n"), F.count_distinct("a").alias("d")
        ).collect()[0]
        if n == d:
            both = (
                cur.select("a")
                .join(cur.select(F.col("b").alias("a")), "a")
                .limit(1).count()
            )
            if both == 0:
                break
    res = cur.agg(
        F.count("*").alias("n"), F.count_distinct("b").alias("k")
    ).collect()[0]
    cur.unpersist()
    return round(time.time() - t0, 2), (int(res["n"]), int(res["k"])), rounds


def run_new() -> tuple[float, int, int]:
    """Engine code (round-5 fused): graph._cc_distributed, no tail cutoff."""
    t0 = time.time()
    part = graph._cc_distributed(und, 50, local_edges_threshold=0)
    res = part.agg(
        F.count("*").alias("n"), F.count_distinct("comp").alias("k")
    ).collect()[0]
    return round(time.time() - t0, 2), (int(res["n"]), int(res["k"])), None


old_w, new_w = [], []
sigs = set()
rounds_old = None
for t in range(TRIALS):
    w, sig, rounds_old = run_old()
    old_w.append(w)
    sigs.add(sig)
    w, sig, _ = run_new()
    new_w.append(w)
    sigs.add(sig)

out = {
    "workload": ("CC distributed star loop: eager-checkpoint+agg (2 driver "
                 "jobs/round, r4 shape) vs fused non-eager-checkpoint "
                 "materialized by the agg (1 job/round, r5 engine code)"),
    "n_edges_raw": N, "n_edges_symmetrized": 2 * N,
    "interleaved_trials": TRIALS, "rounds": rounds_old,
    "identical_outputs": len(sigs) == 1, "signature": sorted(sigs)[0],
    "old_walls_s": old_w, "new_walls_s": new_w,
    "old_best_s": min(old_w), "new_best_s": min(new_w),
    "speedup": round(min(old_w) / min(new_w), 3),
    "note": ("same JVM, same cached symmetrized edges, old/new interleaved "
             "per trial — host drift hits both arms equally."),
}
print(json.dumps(out))
with open(os.path.join(REPO, "BENCH", "cc_fusion_ab_r5.json"), "w") as f:
    json.dump(out, f, indent=2)
spark.stop()

#!/usr/bin/env python
"""Scaling evidence for the connected-components fixpoint (graph.py) —
same discipline as bench_scaling.py (fresh JVM per arm, heap scaled with
cores, tmpfs shuffle dirs, self-calibration inside the first 8-core JVM,
interleaved 8/32/8/32 blocks, min-of-trials) run standalone so the main
BENCH/scaling.json table (measured in a faster host epoch) is not
overwritten. Writes BENCH/cc_scaling_r3.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TARGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 45.0

WORKER = r"""
import json, os, sys, time
from pyspark.sql import functions as F
from gdal_scripts_spark import graph
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); n = int(sys.argv[2]); trials = int(sys.argv[3])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{max(cpus, 8)}g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name=f"scale_cc_{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus, extra_conf=extra)

_cached = {}

def rebuild(m):
    for df in _cached.values():
        df.unpersist()
    _cached.clear()
    # random multigraph: m edges over m/3 nodes -> one giant component plus
    # a tail of small ones; node ids from xxhash64 (deterministic)
    nodes = max(m // 3, 4)
    e = spark.range(0, m, 1, 4 * cpus).select(
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(nodes)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(11)), F.lit(nodes)).alias("dst"),
    ).persist()
    e.count()
    _cached["e"] = e

    thr = int(os.environ.get("CC_LOCAL_THRESHOLD", "5000000"))

    def job():
        cc = graph.connected_components(e, local_edges_threshold=thr)
        return cc.agg(F.count("*"), F.countDistinct("comp")).collect()

    return job

n = n0 = n
job = rebuild(n)
target = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
if target > 0:
    job()
    t0 = time.time(); job(); w = time.time() - t0
    cap = int(os.environ.get("CC_N_CAP", "4000000"))
    n2 = int(min(max(n * target / max(w, 1e-3), n / 8), cap))
    if abs(n2 - n) > 0.25 * n:
        n = n2
        job = rebuild(n)
        job()
walls = []
for _ in range(trials):
    t0 = time.time(); job(); walls.append(round(time.time() - t0, 3))
print(json.dumps({"cpus": cpus, "n": n, "walls": walls}))
"""


def run_worker(*args: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, *args],
        capture_output=True, text=True, cwd=REPO, timeout=2400, env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {args} no output:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    r8a = run_worker("8", "1000000", "2", str(TARGET_S))
    n = r8a["n"]
    r32a = run_worker("32", str(n), "2")
    r8b = run_worker("8", str(n), "2")
    r32b = run_worker("32", str(n), "2")
    w8 = r8a["walls"] + r8b["walls"]
    w32 = r32a["walls"] + r32b["walls"]
    out = {
        "workload": "connected_components",
        "mode": os.environ.get("CC_LOCAL_THRESHOLD", "default"),
        "n_edges": n,
        "wall8": min(w8), "wall32": min(w32),
        "walls8": w8, "walls32": w32,
        "edges_per_s32": round(n / min(w32), 1),
        "efficiency": round((min(w8) / min(w32)) / 4.0, 3),
    }
    suffix = "" if os.environ.get("CC_LOCAL_THRESHOLD") is None else "_distributed"
    path = os.path.join(REPO, "BENCH", f"cc_scaling_r3{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

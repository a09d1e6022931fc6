#!/usr/bin/env python
"""Round-5 scaling evidence (after barrier fusion: non-eager localCheckpoint materialized by the convergence agg — one driver job per round instead of two) for the DISTRIBUTED connected-components path
(graph.py alternating large-star/small-star) ABOVE the hybrid threshold:
20M raw edges (40M symmetrized > LOCAL_EDGES_THRESHOLD=5M), identical input
at local[8] vs local[32], fresh JVM per arm, interleaved 8/32/8/32 blocks,
min-of-trials, tmpfs shuffle dirs. Writes BENCH/cc_scaling_r5.json.

The round-3 measurement (BENCH/cc_scaling_r3_distributed.json) showed the
old label-propagation fixpoint ANTI-scaling (efficiency 0.128 at 1.27M
edges, driver-sync bound); this run is the positive evidence the rewritten
star algorithm scales at the sizes the distributed path actually serves.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "cc_scaling_r5.json"

WORKER = r"""
import json, os, sys, time
from pyspark.sql import functions as F
from gdal_scripts_spark import graph
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); m = int(sys.argv[2]); trials = int(sys.argv[3])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "32g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name=f"scale_cc_{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus, extra_conf=extra)
nodes = m // 3
e = spark.range(0, m, 1, 4 * cpus).select(
    F.pmod(F.xxhash64("id", F.lit(7)), F.lit(nodes)).alias("src"),
    F.pmod(F.xxhash64("id", F.lit(11)), F.lit(nodes)).alias("dst"),
).persist()
e.count()
import numpy as np, zlib, time as _t   # no-Spark host-speed control
def control():
    t0 = _t.time()
    a = np.arange(6_000_000, dtype=np.int64)
    for _ in range(3):
        a = (a * 6364136223846793005 + 1442695040888963407) & ((1 << 63) - 1)
    zlib.crc32(a.tobytes())
    return round(_t.time() - t0, 4)
walls, ctrls = [], []
for _ in range(trials):
    ctrls.append(control())
    t0 = time.time()
    # pure distributed star loop (threshold=0): isolates the scaling of
    # the shuffle rounds themselves. The ENGINE DEFAULT at this size
    # additionally fires the tail cutoff into ONE union-find task, which
    # wins wall but serializes the tail (see cc_cutoff_ab_r4) - its 8/32
    # ratio measures the single task, not the loop.
    cc = graph.connected_components(e, local_edges_threshold=0)
    res = cc.agg(F.count("*").alias("n"), F.countDistinct("comp").alias("k")).collect()
    walls.append(round(time.time() - t0, 2))
print(json.dumps({"cpus": cpus, "m": m, "walls": walls, "controls": ctrls,
                  "n_nodes": res[0]["n"], "k_comps": res[0]["k"]}))
"""


def run_worker(*args: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", WORKER, *args],
        capture_output=True, text=True, cwd=REPO, timeout=3000, env=env,
    )
    lines = [l for l in out.stdout.replace("\r", "\n").splitlines()
             if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {args} no output:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    blocks = []
    for cpus in ("8", "32", "8", "32"):
        blocks.append(run_worker(cpus, str(N_EDGES), "2"))
        print(json.dumps(blocks[-1]), flush=True)
    w8 = [w for b in blocks if b["cpus"] == 8 for w in b["walls"]]
    w32 = [w for b in blocks if b["cpus"] == 32 for w in b["walls"]]
    ctrl = [c for b in blocks for c in b["controls"]]
    assert len({(b["n_nodes"], b["k_comps"]) for b in blocks}) == 1
    out = {
        "workload": "connected_components (alternating large-star/small-star, distributed path)",
        "algorithm": "Kiveris et al. SoCC'14; groupBy+equi-join steps, exact star-forest convergence",
        "n_edges_raw": N_EDGES,
        "n_edges_symmetrized": 2 * N_EDGES,
        "threshold_note": (
            f"{2 * N_EDGES / 1e6:.0f}M symmetrized > LOCAL_EDGES_THRESHOLD="
            "25M -> distributed path exercised (threshold forced to 0 in the "
            "worker to time the pure star loop)"
        ),
        "n_nodes": blocks[0]["n_nodes"], "k_comps": blocks[0]["k_comps"],
        "wall8": min(w8), "wall32": min(w32),
        "walls8": w8, "walls32": w32,
        "controls": ctrl,
        "edges_per_s32": round(N_EDGES / min(w32), 1),
        "efficiency": round((min(w8) / min(w32)) / 4.0, 3),
        "prior_round": "r4 star loop (two driver jobs/round): efficiency 0.419 at 40M sym edges (BENCH/cc_scaling_r4.json); r3 label-propagation fixpoint: 435 s same input",
    }
    with open(os.path.join(REPO, "BENCH", OUT), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""N vs 4N scaling of the fixed-point PageRank loop (graph.pagerank_fixed)
at local[8] vs local[32]: identical deterministic edge set, fresh JVM per
arm, interleaved 8/32/8/32 blocks, min-of-trials, tmpfs shuffle dirs, plus
a no-Spark host-speed control per trial. The integer-arithmetic loop means
both arms MUST return bit-identical rank tables (asserted on the rank
checksum), so this measures plan scaling, not convergence noise.

Per round the plan is one equi-join of the (node, r_scaled) table against
the static outdeg-annotated edge table plus one groupBy-sum — the same
shuffle unit as one CC star round, but with a static edge table (no edge
rewriting), so it isolates the sync/shuffle cost of synchronous iteration.

Writes BENCH/pagerank_scaling_r5.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 6
OUT = sys.argv[3] if len(sys.argv) > 3 else "pagerank_scaling_r5.json"

WORKER = r"""
import json, os, sys, time
from pyspark.sql import functions as F
from gdal_scripts_spark import graph
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); m = int(sys.argv[2]); iters = int(sys.argv[3]); trials = int(sys.argv[4])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "32g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name=f"pr_{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus, extra_conf=extra)
nodes = m // 4
e = spark.range(0, m, 1, 4 * cpus).select(
    F.pmod(F.xxhash64("id", F.lit(7)), F.lit(nodes)).alias("src"),
    F.pmod(F.xxhash64("id", F.lit(11)), F.lit(nodes)).alias("dst"),
).persist()
e.count()
import numpy as np, zlib, time as _t
def control():
    t0 = _t.time()
    a = np.arange(6_000_000, dtype=np.int64)
    for _ in range(3):
        a = (a * 6364136223846793005 + 1442695040888963407) & ((1 << 63) - 1)
    zlib.crc32(a.tobytes())
    return round(_t.time() - t0, 4)
walls, ctrls, sig = [], [], None
for _ in range(trials):
    ctrls.append(control())
    t0 = time.time()
    pr = graph.pagerank_fixed(e, n_iters=iters)
    row = pr.agg(F.count("*").alias("n"), F.sum("r_scaled").alias("s"),
                 F.sum(F.col("node") * F.col("r_scaled")).alias("x")).collect()[0]
    walls.append(round(time.time() - t0, 2))
    sig = (int(row["n"]), int(row["s"]), int(row["x"]))
print(json.dumps({"cpus": cpus, "m": m, "walls": walls, "controls": ctrls,
                  "sig": sig}))
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
        blocks.append(run_worker(cpus, str(N_EDGES), str(N_ITERS), "2"))
        print(json.dumps(blocks[-1]), flush=True)
    assert len({tuple(b["sig"]) for b in blocks}) == 1, (
        "rank tables diverged across arms", [b["sig"] for b in blocks])
    w8 = [w for b in blocks if b["cpus"] == 8 for w in b["walls"]]
    w32 = [w for b in blocks if b["cpus"] == 32 for w in b["walls"]]
    out = {
        "workload": f"pagerank_fixed ({N_ITERS} synchronous integer rounds)",
        "n_edges": N_EDGES,
        "n_nodes": N_EDGES // 4,
        "rank_sig_identical_across_arms": True,
        "wall8": min(w8), "wall32": min(w32),
        "walls8": w8, "walls32": w32,
        "controls": [c for b in blocks for c in b["controls"]],
        "edge_visits_per_s32": round(N_ITERS * N_EDGES / min(w32), 1),
        "efficiency": round((min(w8) / min(w32)) / 4.0, 3),
        "note": ("fresh JVM per arm, interleaved 8/32/8/32, min of 2 "
                 "trials, tmpfs shuffle; one equi-join + one groupBy-sum "
                 "per round over a STATIC outdeg-annotated edge table"),
    }
    with open(os.path.join(REPO, "BENCH", OUT), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

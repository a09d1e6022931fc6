#!/usr/bin/env python
"""Controlled A/B of CC round fusion (rounds_per_sync 1 vs 2), drift-immune.

Second round-5 barrier cut: `_cc_distributed(rounds_per_sync=2)` chains two
full large+small star rounds inside one lineage per checkpoint+convergence
barrier (both steps are identities on a star forest, so overshooting the
fixpoint is harmless — equality pinned by
tests/test_graph.py::test_round_fusion_matches_unfused). This bench
isolates the change in ONE local[32] JVM on the SAME cached symmetrized
edge table, rps=1/rps=2 interleaved per trial; identical (n_rows, k_comps)
asserted. Writes BENCH/cc_rps_ab_r5.json.
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
spark = get_spark(app_name="cc_rps_ab", cpus=32, shuffle_partitions=64,
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


def run(rps: int) -> tuple[float, tuple[int, int]]:
    t0 = time.time()
    part = graph._cc_distributed(
        und, 50, local_edges_threshold=0, rounds_per_sync=rps
    )
    res = part.agg(
        F.count("*").alias("n"), F.count_distinct("comp").alias("k")
    ).collect()[0]
    return round(time.time() - t0, 2), (int(res["n"]), int(res["k"]))


w1, w2 = [], []
sigs = set()
for t in range(TRIALS):
    w, sig = run(1)
    w1.append(w)
    sigs.add(sig)
    w, sig = run(2)
    w2.append(w)
    sigs.add(sig)

out = {
    "workload": ("CC distributed star loop: one checkpoint+convergence "
                 "barrier per star round (rps=1) vs per TWO rounds (rps=2, "
                 "r5 engine default) — same JVM, same cached symmetrized "
                 "edges, arms interleaved per trial"),
    "n_edges_raw": N, "n_edges_symmetrized": 2 * N,
    "interleaved_trials": TRIALS,
    "identical_outputs": len(sigs) == 1, "signature": sorted(sigs)[0],
    "rps1_walls_s": w1, "rps2_walls_s": w2,
    "rps1_best_s": min(w1), "rps2_best_s": min(w2),
    "speedup": round(min(w1) / min(w2), 3),
}
print(json.dumps(out))
with open(os.path.join(REPO, "BENCH", "cc_rps_ab_r5.json"), "w") as f:
    json.dump(out, f, indent=2)
spark.stop()

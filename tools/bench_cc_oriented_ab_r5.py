#!/usr/bin/env python
"""Controlled A/B of the round-5 ORIENTED large-star rewrite.

Every loop input is strictly child>parent oriented, so the textbook
symmetrization inside large-star is redundant: the step reduces to one
edge-width left join against a node-sized min table — HALF the per-round
shuffle volume (no 2x union before the groupBy, no 2x join probe).
Output multiset equality with the symmetrized form is pinned by
tests/test_graph.py::test_oriented_large_star_matches_symmetrized; this
bench measures what the halving buys, drift-immune: ONE local[32] JVM,
SAME cached edge table, old/new interleaved per trial, identical
(n_nodes, k_comps) asserted. Writes BENCH/cc_oriented_ab_r5.json.
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
spark = get_spark(app_name="cc_oriented_ab", cpus=32, shuffle_partitions=64,
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


def _large_star_sym(e):
    """The pre-round-5 textbook form: symmetrize, then groupBy + join."""
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mn = sym.groupBy("a").agg(F.least(F.min("b"), F.col("a")).alias("m"))
    return (
        sym.join(mn, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )


def _loop(large_star) -> tuple[float, tuple[int, int], int]:
    """The engine's fused round-5 loop shape, parametrized by the step."""
    t0 = time.time()
    cur = und
    prev = None
    rounds = 0
    for _ in range(50):
        cur = graph._small_star(large_star(cur)).localCheckpoint(eager=False)
        rounds += 1
        n, d = cur.agg(
            F.count("*").alias("n"), F.count_distinct("a").alias("d")
        ).collect()[0]
        if prev is not None:
            prev.unpersist()
        prev = cur
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


old_w, new_w = [], []
sigs = set()
rounds = None
for t in range(TRIALS):
    w, sig, rounds = _loop(_large_star_sym)
    old_w.append(w)
    sigs.add(sig)
    w, sig, _ = _loop(graph._large_star)
    new_w.append(w)
    sigs.add(sig)

out = {
    "workload": ("CC star loop: textbook symmetrized large-star (2x-width "
                 "union + 2x-width join probe per round) vs round-5 "
                 "oriented large-star (one edge-width join, node-sized "
                 "agg) — identical fused loop shape in both arms"),
    "n_edges_raw": N, "n_edges_symmetrized": 2 * N,
    "interleaved_trials": TRIALS, "rounds": rounds,
    "identical_outputs": len(sigs) == 1, "signature": sorted(sigs)[0],
    "old_walls_s": old_w, "new_walls_s": new_w,
    "old_best_s": min(old_w), "new_best_s": min(new_w),
    "speedup": round(min(old_w) / min(new_w), 3),
    "note": ("same JVM, same cached oriented edges, old/new interleaved "
             "per trial — host drift hits both arms equally."),
}
print(json.dumps(out))
with open(os.path.join(REPO, "BENCH", "cc_oriented_ab_r5.json"), "w") as f:
    json.dump(out, f, indent=2)
spark.stop()

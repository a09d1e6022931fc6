#!/usr/bin/env python
"""A/B: degree-oriented triangle counting (graph.triangle_counts, Suri &
Vassilvitskii WWW'11) vs the naive wedge join that keys every wedge on its
center vertex, on the SAME skewed graph — the "last reducer" experiment.

Skew model: a base near-uniform graph plus a hub vertex attracting
``hub_frac`` of all edges. The naive plan's hub key owns deg_hub^2 wedges;
orientation caps every vertex's out-degree at O(sqrt(m)), so the worst key
shrinks from deg_hub^2 to ~m regardless of skew. Both arms must return the
IDENTICAL per-node triangle table (asserted via checksum) — this is a plan
A/B, not an approximation.

Also reports the CLOSED-FORM wedge totals (sum deg*(deg-1)/2 naive vs sum
outdeg^2 oriented) for heavier skew settings where the naive arm would not
terminate on this box — the extrapolation that matters at 100 TB.

Writes BENCH/tri_skew_ab_r5.json. Fresh JVM per arm, min-of-trials.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
M = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
HUB_PCT = int(sys.argv[2]) if len(sys.argv) > 2 else 1  # % of edges into hub 0
TRIALS = 2

WORKER = r"""
import json, sys, time
from pyspark.sql import functions as F
from gdal_scripts_spark import graph
from gdal_scripts_spark.session import get_spark

mode, m, hub_pct, trials = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
spark = get_spark(app_name=f"tri_{mode}", cpus=32, shuffle_partitions=64)
n = m // 3
base = spark.range(0, m, 1, 128).select(
    F.pmod(F.xxhash64("id", F.lit(7)), F.lit(n)).alias("src"),
    F.when(F.pmod(F.xxhash64("id", F.lit(13)), F.lit(100)) < hub_pct, F.lit(0))
     .otherwise(F.pmod(F.xxhash64("id", F.lit(11)), F.lit(n))).alias("dst"),
)
e = (base.select(F.least("src", "dst").alias("a"),
                 F.greatest("src", "dst").alias("b"))
         .filter(F.col("a") != F.col("b")).distinct().persist())
n_edges = e.count()

def oriented():
    out = graph.triangle_counts(e, "a", "b")
    return out.agg(F.sum("n_tri").alias("s"), F.count("*").alias("c"),
                   F.sum(F.col("node") * F.col("n_tri")).alias("x")
                   ).collect()[0]

def naive():
    # wedge join keyed on the CENTER vertex (no orientation): every
    # triangle a<b<c appears once as wedge (a-b, b-c)? No - center key
    # join: wedges (x; y, z) with y < z from edges (x,y),(x,z) in the
    # symmetrized adjacency, closed by undirected edge (y,z).
    sym = e.select("a", "b").unionAll(e.select(F.col("b").alias("a"),
                                               F.col("a").alias("b")))
    o1 = sym.select(F.col("a").alias("x"), F.col("b").alias("y"))
    o2 = sym.select(F.col("a").alias("x"), F.col("b").alias("z"))
    wedges = o1.join(o2, "x").filter(F.col("y") < F.col("z"))
    tris = wedges.join(e.select(F.col("a").alias("y"),
                                F.col("b").alias("z")), ["y", "z"])
    # each triangle counted once per center vertex = 3x total; per-node
    # count of triangles containing the node = count as center
    per_node = tris.groupBy(F.col("x").alias("node")).agg(
        F.count("*").cast("long").alias("n_tri"))
    return per_node.agg(F.sum("n_tri").alias("s"), F.count("*").alias("c"),
                        F.sum(F.col("node") * F.col("n_tri")).alias("x")
                        ).collect()[0]

fn = oriented if mode == "oriented" else naive
walls, sig = [], None
for _ in range(trials):
    t0 = time.time(); r = fn(); walls.append(time.time() - t0)
    sig = (int(r["s"] or 0), int(r["c"] or 0), int(r["x"] or 0))
print(json.dumps({"mode": mode, "n_edges": n_edges, "walls": walls,
                  "wall": min(walls), "tri_sum": sig[0], "nodes": sig[1],
                  "xsum": sig[2]}))
"""


def run(mode: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, mode, str(M), str(HUB_PCT), str(TRIALS)],
        cwd=REPO, capture_output=True, text=True, timeout=3000)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def wedge_model(m: int, hub_frac: float) -> dict:
    """Closed-form naive vs oriented wedge totals for a uniform graph of
    avg degree d_avg plus one hub with hub_frac of all edge endpoints."""
    n = m // 3
    d_avg = 2.0 * m / n
    hub_deg = hub_frac * m
    naive = n * d_avg * (d_avg - 1) / 2 + hub_deg * (hub_deg - 1) / 2
    # orientation: out-degree <= sqrt(2m) for every vertex
    cap = (2 * m) ** 0.5
    oriented = n * min(d_avg, cap) ** 2 / 2 + min(hub_deg, cap) ** 2 / 2
    return {"m": m, "hub_frac": hub_frac, "naive_wedges": int(naive),
            "oriented_wedges_bound": int(oriented),
            "ratio": round(naive / oriented, 1)}


def main() -> None:
    a = run("oriented")
    b = run("naive")
    assert (a["tri_sum"], a["nodes"], a["xsum"]) == (
        b["tri_sum"], b["nodes"], b["xsum"]), (
        "arms disagree", a, b)
    res = {
        "bench": "triangle_skew_ab_r5",
        "edges": a["n_edges"], "hub_pct": HUB_PCT, "trials": TRIALS,
        "oriented_s": a["wall"], "naive_s": b["wall"],
        "speedup": round(b["wall"] / a["wall"], 2),
        "tri_sum": a["tri_sum"],
        "outputs_identical": True,
        "extrapolation_wedge_model": [
            wedge_model(10**9, f) for f in (0.001, 0.01, 0.05)],
        "note": ("same skewed graph, fresh JVM per arm, min of "
                 f"{TRIALS} trials at local[32]; naive keys wedges on the "
                 "center vertex (hub owns deg^2), oriented caps out-degree "
                 "at O(sqrt(m)) by (degree,id) ranking"),
    }
    path = os.path.join(REPO, "BENCH", "tri_skew_ab_r5.json")
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

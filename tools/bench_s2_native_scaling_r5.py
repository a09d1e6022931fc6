#!/usr/bin/env python
"""N->4N scaling of the fully TABLE-DRIVEN shuffled S2 join (round 5).

The pip_s2 row in BENCH/BASELINE.md reads 0.249 efficiency because its
Arrow refine moves EVERY candidate through the JVM->Arrow copy — a
core-count-invariant floor on one memory bus. The round-5 table-driven
shape (`spatial_join_s2(pack=None, refine="native",
broadcast_regions=False, prefilter_z=12)`) has no Python anywhere in
the refine: the parity fold is a JVM expression over the joined edge
arrays, interior cells bypass it via OR short-circuit, and both joins
are shuffled hash joins. The codegen grid prefilter (cluster-built
tiles — grid_cover_tiles_from_table, the third and last dim artifact
to go table-driven) drops ~98% of points BEFORE the one remaining
Python stage (the Arrow leaf encode), so the copy floor rides on the
selective fraction, not the corpus. The once-per-region-set artifact
builds (covering + edges + tiles) are cluster-parallel; the covering
build wall is reported at both core counts too. Points are generated
inline per trial (codegen, not a persisted cache scan — reading one
shared in-memory cache with 32 threads measures this box's memory
bus, not the plan; same convention as bench_scaling.py workloads).

Same discipline as bench_cc_r5: fresh JVM per arm, interleaved
8/32/8/32 blocks, min-of-trials, tmpfs shuffle dirs, no-Spark host
control per trial. Identical pair counts asserted across every arm.
Writes BENCH/s2_native_scaling_r5.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 200M: at 20M the whole job is 4-7 s of fixed overhead (local[32] reads
# SLOWER than local[8]) — the calibration discipline in BENCH/BASELINE.md
# wants the 8-core wall in the tens of seconds so the engine, not the
# scheduler, is what's being measured.
N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000_000
K_POLYS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

WORKER = r"""
import json, os, sys, time
import numpy as np
from pyspark.sql import functions as F
from gdal_scripts_spark import joins
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); n = int(sys.argv[2]); k = int(sys.argv[3])
trials = int(sys.argv[4])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "32g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name=f"s2nat_{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus, extra_conf=extra)

SIDE = 0.08; LAT0, LAT1 = 55.0, 85.0
points = (
    spark.range(0, n, 1, 4 * cpus)
    .select(
        F.col("id").alias("image_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_200_000)).cast("double")
         / 10_000.0 - 60.0).alias("lon"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(int((LAT1 - LAT0) * 1e4)))
         .cast("double") / 10_000.0 + LAT0).alias("lat"),
    )
)

# polygon TABLE (standard layer schema) — same deterministic rects as
# bench_s2_regime; no driver-side PolygonPack anywhere in this tool
rng = np.random.default_rng(17)
cx = rng.uniform(-60 + SIDE, 60 - SIDE, k)
cy = rng.uniform(LAT0 + SIDE, LAT1 - SIDE, k)
rows = [
    (int(i), [[
        {"x": float(cx[i] - SIDE / 2), "y": float(cy[i] - SIDE / 2)},
        {"x": float(cx[i] + SIDE / 2), "y": float(cy[i] - SIDE / 2)},
        {"x": float(cx[i] + SIDE / 2), "y": float(cy[i] + SIDE / 2)},
        {"x": float(cx[i] - SIDE / 2), "y": float(cy[i] + SIDE / 2)},
    ]])
    for i in range(k)
]
polys = spark.createDataFrame(
    rows, schema="poly_id long, rings array<array<struct<x:double,y:double>>>"
).repartition(4 * cpus).persist()
polys.count()

# cluster-parallel ingest artifacts (timed: the build itself scales now)
t0 = time.time()
regions = joins.s2_cover_regions_from_table(polys, max_level=12).persist()
n_cells = regions.count()
build_s = round(time.time() - t0, 2)
edges = joins.polygon_edges_df_from_table(polys).persist()
edges.count()
tiles = joins.grid_cover_tiles_from_table(polys, 12).persist()
n_tiles = tiles.count()

import zlib
def control():
    t0 = time.time()
    a = np.arange(6_000_000, dtype=np.int64)
    for _ in range(3):
        a = (a * 6364136223846793005 + 1442695040888963407) & ((1 << 63) - 1)
    zlib.crc32(a.tobytes())
    return round(time.time() - t0, 4)

walls, ctrls = [], []
pairs = None
for _ in range(trials):
    ctrls.append(control())
    t0 = time.time()
    out = joins.spatial_join_s2(
        points, None, regions=regions, refine="native", edges=edges,
        broadcast_regions=False, prefilter_z=12, prefilter_tiles=tiles)
    pairs = out.count()
    walls.append(round(time.time() - t0, 2))
print(json.dumps({"cpus": cpus, "n": n, "k": k, "build_s": build_s,
                  "n_region_cells": n_cells, "n_tiles": n_tiles, "pairs": pairs,
                  "walls": walls, "controls": ctrls}))
spark.stop()
"""


def run_worker(cpus: int, trials: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(N_POINTS),
         str(K_POLYS), str(trials)],
        capture_output=True, text=True, cwd=REPO,
    )
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(f"worker cpus={cpus} failed")
    return json.loads(p.stdout.strip().splitlines()[-1])


blocks = []
for cpus in (8, 32, 8, 32, 8, 32):
    blocks.append(run_worker(cpus, 3))
    print(json.dumps(blocks[-1]), flush=True)

w8 = [w for b in blocks if b["cpus"] == 8 for w in b["walls"]]
w32 = [w for b in blocks if b["cpus"] == 32 for w in b["walls"]]
b8 = [b["build_s"] for b in blocks if b["cpus"] == 8]
b32 = [b["build_s"] for b in blocks if b["cpus"] == 32]
assert len({b["pairs"] for b in blocks}) == 1, "pair counts diverged"
eff = round(min(w8) / min(w32) / 4.0, 3)
out = {
    "workload": ("table-driven shuffled S2 covering join, native JVM refine"
                 " (pack=None, refine='native', broadcast_regions=False,"
                 " prefilter_z=12 with cluster-built tiles): selective"
                 " high-latitude regime, rings covering lvl<=12"),
    "n_points": N_POINTS, "n_polygons": K_POLYS,
    "n_region_cells": blocks[0]["n_region_cells"],
    "pairs": blocks[0]["pairs"],
    "wall8": min(w8), "wall32": min(w32),
    "walls8": w8, "walls32": w32,
    "points_per_s32": round(N_POINTS / min(w32), 1),
    "efficiency": eff,
    "cover_build_s8": min(b8), "cover_build_s32": min(b32),
    "cover_build_speedup": round(min(b8) / min(b32), 2),
    "controls": [c for b in blocks for c in b["controls"]],
    "contrast": ("pip_s2 (Arrow-refine broadcast path) reads 0.249 in the "
                 "main table — every candidate crosses the JVM->Arrow copy "
                 "floor; this shape's only Python stage is the leaf encode"),
}
print(json.dumps(out))
with open(os.path.join(REPO, "BENCH", "s2_native_scaling_r5.json"), "w") as f:
    json.dump(out, f, indent=2)

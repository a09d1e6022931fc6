#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule: >=0.8 from N to 4N executors).

Sandbox stand-in per driver instruction: the SAME deterministic jobs at
local[8] and local[32] (N and 4N cores), each configuration in a fresh JVM
subprocess with heap scaled with cores (a 4N-executor cluster has 4N x
memory and 4N x disks; this box shares ONE disk and memory bus — the
no-Spark control row measures the host's own process-scaling ceiling).

Two defenses against this sandbox's measurement hazards (the host is a VM
whose effective CPU speed drifts by up to ~10x across hours):

1. **Size calibration** — each workload is first probed and its input size
   scaled so the local[8] wall lands near ``TARGET_S`` seconds; sub-5s walls
   measure JVM/job fixed overhead, not the engine.
2. **Interleaved blocks** — 8-core and 32-core runs alternate
   (8,32,8,32) minutes apart, so both see the same machine state; the
   efficiency uses min-wall per level across blocks.

Workloads (BASELINE.json metric = "spatial-join + tile-assignment"):
  assign       tile/cell/morton encode over spark.range rows — pure codegen
  salted_join  Zipf-hot (80% one cell) salted cell equi-join, shuffle-hash,
               JVM-only agg — the both-sides-large spatial-join plan
  pip          broadcast PiP join (distributed-synthesized points vs 200
               polygons) — the Arrow/numpy refine stage
  pip_native   the SAME join via joins.spatial_join_native — zero Python
               workers (higher-order parity fold). Measured ~20x SLOWER
               than the Arrow refine (interpreted HOF; see
               BENCH/pip_native_ab_r3.json) — kept as the measured
               counterfactual, not in the main loop
  tile_cut     XYZ tile cutting over synthesized images — Python raster stage
  control      mp.Pool numpy+zlib, no Spark — host ceiling

Salting A/B at local[32] (forced SMJ, AQE skew-split off in both arms)
demonstrates the explicit hot-cell defense. Writes BENCH/BASELINE.md +
BENCH/scaling.json.  Usage: python bench_scaling.py [target_seconds]
"""

from __future__ import annotations

import json
import os
import platform
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
TARGET_S = float(sys.argv[1]) if len(sys.argv) > 1 else 90.0

# starting size per workload; the worker self-calibrates toward TARGET_S
SIZES = {
    "assign": 50_000_000,
    "s2_assign": 20_000_000,
    "salted_join": 8_000_000,
    "bucketed_join": 8_000_000,
    "pip": 4_000_000,
    "pip_s2": 8_000_000,
    "pip_native": 2_000_000,
    "tile_cut": 40_000,
}

WORKER = r"""
import json, sys, time, os
from pyspark.sql import functions as F
from gdal_scripts_spark import fixtures, joins, raster
from gdal_scripts_spark.cells import cell_id, lonlat_to_tile_tms, tms_to_xyz_y, morton_interleave
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); wl = sys.argv[2]; n = int(sys.argv[3]); trials = int(sys.argv[4])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{max(cpus, 8)}g"  # memory scales with cores
# shuffle dirs on tmpfs when available: the sandbox's ONE disk is an
# artifact a real 4N-executor cluster doesn't have (its shuffle disks scale
# with executor count); tmpfs isolates the engine's scaling from it
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    # on tmpfs the lz4 shuffle codec is pure CPU overhead (there is no disk
    # or network to save): off => measured 0.51 -> 0.59 salted-join
    # efficiency and ~15% lower local[32] wall. On a real cluster with
    # network shuffle, compression stays ON — this knob is part of the
    # single-box stand-in only.
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
    extra["spark.sql.warehouse.dir"] = "/dev/shm/spark-graft-warehouse-scale"
spark = get_spark(app_name=f"scale_{wl}_{cpus}", cpus=cpus,
                  shuffle_partitions=2*cpus, extra_conf=extra)

u = lambda k: (F.xxhash64(F.col("id"), F.lit(k)).cast("double") / F.lit(float(1<<63)) + F.lit(1.0)) / F.lit(2.0)
lonw = F.when(u(1) < 0.8, F.lit(139.7) + (u(2)-0.5)*1.0).otherwise((u(3)-0.5)*359.0)
latw = F.when(u(1) < 0.8, F.lit(35.6) + (u(4)-0.5)*1.0).otherwise((u(5)-0.5)*167.0)
tx, ty = lonlat_to_tile_tms(F.col("lon"), F.col("lat"), 12)

def synth_pts(m):
    return spark.range(0, m, 1, 4*cpus).select(F.col("id"), lonw.alias("lon"), latw.alias("lat"))

CAPS = {"assign": 4_000_000_000, "s2_assign": 2_000_000_000,
        "salted_join": 200_000_000,
        "bucketed_join": 2_000_000_000,
        "pip": 40_000_000, "pip_s2": 400_000_000,
        "pip_native": 1_000_000_000, "tile_cut": 400_000}
n_cap = CAPS[wl]
_cached = {}

def rebuild(m):
    for df in _cached.values():
        df.unpersist()
    _cached.clear()
    if wl == "assign":
        def job():
            return synth_pts(m).select("id", tx.alias("tx"), tms_to_xyz_y(ty,12).alias("y_xyz"),
                morton_interleave(tx, ty).alias("qkm"),
                cell_id(F.col("lon"), F.col("lat"), 8).alias("cell")
            ).agg(F.count("*"), F.min("cell"), F.max("qkm")).collect()
    elif wl == "s2_assign":
        # north-star "batched S2 cell encoding": Arrow-batched numpy
        # Hilbert encode (one Python hop, real per-byte compute — unlike
        # pip's near-passthrough refine), parent snap + rollup in codegen
        from gdal_scripts_spark import s2 as s2mod
        def job():
            enc = synth_pts(m).select(
                "id",
                s2mod.s2_cell_id(F.col("lon"), F.col("lat"), 30).alias("leaf"))
            enc = enc.withColumn("c12", s2mod.s2_parent(F.col("leaf"), 12))
            return enc.agg(F.count("*"), F.min("leaf"), F.max("c12")).collect()
    elif wl == "salted_join":
        pts = synth_pts(m).persist(); pts.count(); _cached["pts"] = pts
        dim = spark.range(200).select(F.col("id").alias("poly_id"),
            F.explode(F.array(*[F.lit(i*37) for i in range(40)])).alias("cell"))
        def job():
            enc = pts.select("id", F.pmod(cell_id(F.col("lon"),F.col("lat"),8), F.lit(100000)).alias("cell"))
            s = enc.withColumn("s", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(16)))
            d2 = dim.withColumn("s", F.explode(F.array(*[F.lit(i) for i in range(16)])))
            joined = s.join(d2.hint("shuffle_hash"), ["cell","s"])
            return joined.select(F.xxhash64("id","poly_id").alias("h")).agg(
                F.sum(F.col("h")%1000), F.count("*")).collect()
    elif wl == "bucketed_join":
        # the CO-LOCATED variant of salted_join: same Zipf-hot points, the
        # salt baked into the bucketed table LAYOUT at write time (Iceberg
        # analog: PARTITIONED BY (bucket(B, cell))). 64 salts spread the
        # hot cell across all 64 buckets; the join itself is zero-Exchange,
        # so it should track the host ceiling, not the shared shuffle disk.
        # The write (the amortized ingest shuffle) is NOT in the timed job.
        NB = NS = 64
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        enc = synth_pts(m).select(
            "id", F.pmod(cell_id(F.col("lon"), F.col("lat"), 8), F.lit(100000)).alias("cell"))
        sdf = enc.withColumn("s", F.pmod(F.xxhash64("id", F.lit(2)), F.lit(NS)))
        dim = spark.range(200).select(F.col("id").alias("poly_id"),
            F.explode(F.array(*[F.lit(i*37) for i in range(40)])).alias("cell"))
        # bucket pruning requires EXACT key types on both sides: an int->
        # bigint cast in the join keys silently disables the bucketed scan
        d2 = dim.withColumn("s", F.explode(F.array(*[F.lit(i) for i in range(NS)]))).select(
            "poly_id", F.col("cell").cast("long").alias("cell"),
            F.col("s").cast("long").alias("s"))
        import shutil as _sh
        _sh.rmtree("/dev/shm/spark-graft-warehouse-scale", ignore_errors=True)
        for t in ("scale_bf", "scale_bd"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        (sdf.repartition(NB, "cell", "s").write.mode("overwrite")
            .bucketBy(NB, "cell", "s").sortBy("cell", "s").saveAsTable("scale_bf"))
        (d2.repartition(NB, "cell", "s").write.mode("overwrite")
            .bucketBy(NB, "cell", "s").sortBy("cell", "s").saveAsTable("scale_bd"))
        co = spark.table("scale_bf").join(spark.table("scale_bd"), ["cell", "s"])
        plan = co._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed scaling join must be co-located"
        def job():
            return co.select(F.xxhash64("id", "poly_id").alias("h")).agg(
                F.sum(F.col("h") % 1000), F.count("*")).collect()
    elif wl == "pip":
        pts = synth_pts(m).select(F.col("id").alias("image_id"), "lon", "lat").persist()
        pts.count(); _cached["pts"] = pts
        pack = fixtures.polygons_pack(p=200)
        def job():
            return joins.spatial_join_broadcast(pts, pack).count()
    elif wl == "pip_s2":
        # filter-refine split: rings covering with EXACT interior flags
        # (precomputed once, like a deployed dim-side covering table);
        # interior candidates bypass the ray cast inside the refine
        # kernel, so the Python stage scales with the polygon BOUNDARY
        # fraction (interior area frac 0.79 at max_level=10 for this
        # pack) instead of the full match volume
        pts = synth_pts(m).select(F.col("id").alias("image_id"), "lon", "lat").persist()
        pts.count(); _cached["pts"] = pts
        pack = fixtures.polygons_pack(p=200)
        reg = joins.s2_cover_regions(spark, pack, max_level=10,
                                     cover="rings").persist()
        reg.count(); _cached["reg"] = reg
        def job():
            return joins.spatial_join_s2(pts, pack, id_col="image_id",
                                         regions=reg,
                                         split_interior=True).count()
    elif wl == "pip_native":
        pts = synth_pts(m).select(F.col("id").alias("image_id"), "lon", "lat").persist()
        pts.count(); _cached["pts"] = pts
        pack = fixtures.polygons_pack(p=200)
        def job():
            return joins.spatial_join_native(pts, pack, z=8).count()
    elif wl == "tile_cut":
        images = fixtures.synth_images_spark(spark, m, partitions=4*cpus).persist()
        images.count(); _cached["images"] = images
        def job():
            return raster.cut_image_tiles(images, z=11, resampling="bilinear").count()
    else:
        raise SystemExit(f"unknown workload {wl}")
    return job

job = rebuild(n)

target = float(sys.argv[5]) if len(sys.argv) > 5 else 0.0
if target > 0:
    # self-calibrate inside THIS JVM (the host's effective speed drifts
    # across minutes — a probe taken in another process/epoch misleads):
    # warm once (first-call codegen/JIT can be 100x), time once, rescale n
    # toward the target wall, rebuild job
    job()
    t0 = time.time(); job(); w = time.time() - t0
    n2 = int(min(max(n * target / max(w, 1e-3), n / 8), n_cap))
    if abs(n2 - n) > 0.25 * n:
        n = n2
        job = rebuild(n)
        job()  # warm the rescaled plan
walls = []
for t in range(trials):
    t0 = time.time(); job(); walls.append(round(time.time() - t0, 3))
print(json.dumps({"cpus": cpus, "workload": wl, "n": n, "walls": walls,
                  "wall_s": min(walls), "throughput": round(n / min(walls), 1)}), flush=True)
spark.stop()
"""

SALT_AB = r"""
import json, sys, time, os
from pyspark.sql import functions as F
from gdal_scripts_spark import fixtures
from gdal_scripts_spark.session import get_spark
cpus = 32; salt = sys.argv[1] == "salt"; n = 2_000_000
os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{cpus}g"
spark = get_spark(app_name=f"saltab_{salt}", cpus=cpus, shuffle_partitions=2*cpus)
spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
pts = fixtures.points_spark(spark, n, partitions=2*cpus)
pts = pts.withColumn("cell",
    F.when(F.pmod(F.xxhash64("image_id"), F.lit(10)) < 8, F.lit(123456789))
    .otherwise(F.pmod(F.xxhash64("image_id", F.lit(1)), F.lit(100000)))).persist()
pts.count()
dim = spark.range(200).select(F.col("id").alias("poly_id"),
    F.explode(F.array(*[F.lit(123456789)] + [F.lit(i * 37) for i in range(40)])).alias("cell"))
walls = []
for trial in range(2):
    t0 = time.time()
    if salt:
        nsalts = 16
        p2 = pts.withColumn("s", F.pmod(F.xxhash64("image_id", F.lit(2)), F.lit(nsalts)))
        d2 = dim.withColumn("s", F.explode(F.array(*[F.lit(i) for i in range(nsalts)])))
        joined = p2.join(d2.hint("merge"), ["cell", "s"])
    else:
        joined = pts.join(dim.hint("merge"), ["cell"])
    pairs = joined.select(F.xxhash64("image_id", "poly_id").alias("h")) \
        .agg(F.sum(F.col("h") % 1000).alias("s"), F.count("*").alias("c")).collect()[0]["c"]
    walls.append(round(time.time() - t0, 3))
print(json.dumps({"cpus": cpus, "salt": salt, "n": n, "walls": walls,
                  "wall_s": min(walls), "pairs": pairs,
                  "throughput": round(n / min(walls), 1)}), flush=True)
spark.stop()
"""


BUCKET_AB = r"""
import json, sys, time, os, shutil
from pyspark.sql import functions as F
from gdal_scripts_spark import bucketing, joins, fixtures
from gdal_scripts_spark.session import get_spark
cpus = 32; n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
os.environ["SPARK_GRAFT_DRIVER_MEM"] = f"{cpus}g"
wh = "/dev/shm/spark-graft-warehouse" if os.path.isdir("/dev/shm") else None
extra = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
if wh:
    shutil.rmtree(wh, ignore_errors=True)
    extra["spark.sql.warehouse.dir"] = wh
spark = get_spark(app_name="bucket_ab", cpus=cpus, shuffle_partitions=2*cpus,
                  extra_conf=extra)
# synthetic cell-keyed fact + dim; ONE bucketed write (the amortized cost),
# then the same join bucketed vs plain — evidence for the 100 TB
# co-location story (Iceberg: PARTITIONED BY (bucket(N, cell)))
fact = spark.range(0, n, 1, 4*cpus).select(
    F.col("id"), F.pmod(F.xxhash64("id"), F.lit(100000)).alias("cell"),
    (F.col("id") % 1000).alias("v"))
dim = spark.range(0, 100000, 1, 8).select(
    F.col("id").alias("cell"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(97)).alias("w"))
for t in ("bf", "bd"):
    spark.sql(f"DROP TABLE IF EXISTS {t}")
t0 = time.time()
# repartition by the bucket key FIRST: bucketBy uses the same Murmur3 hash
# as HashPartitioning, so each writer task then holds exactly one bucket ->
# ONE file per bucket (without this, P writer tasks x B buckets = P*B tiny
# files, and the read-side footer churn swamps the shuffle savings);
# sortBy(key) lets the merge join skip its read-time Sort too.
bucketing.write_bucketed(fact.repartition(2*cpus, "cell"), "bf",
                         key="cell", n_buckets=2*cpus, sort_by="cell")
bucketing.write_bucketed(dim.repartition(2*cpus, "cell"), "bd",
                         key="cell", n_buckets=2*cpus, sort_by="cell")
t_write = round(time.time() - t0, 3)
agg = lambda d: d.select((F.col("v") * F.col("w")).alias("x")).agg(
    F.sum("x"), F.count("*")).collect()
res = {"n": n, "t_bucketed_write": t_write}
co = bucketing.bucketed_join(spark, "bf", "bd", "cell")
res["exchanges_bucketed"] = bucketing.count_exchanges(co)
# plain arm: same data re-read WITHOUT bucket metadata (raw parquet files)
fact.write.mode("overwrite").parquet((wh or "/tmp") + "/plain_fact")
dim.write.mode("overwrite").parquet((wh or "/tmp") + "/plain_dim")
pf = spark.read.parquet((wh or "/tmp") + "/plain_fact")
pd_ = spark.read.parquet((wh or "/tmp") + "/plain_dim")
pj = pf.join(pd_, "cell")
res["exchanges_plain"] = bucketing.count_exchanges(pj)
# interleave the arms trial-by-trial (host speed drifts — BENCH/BASELINE.md
# methodology), min-of-trials per arm
walls = {"bucketed": [], "plain": []}
for arm, d in (("bucketed", co), ("plain", pj)):
    agg(d)  # warm
for _ in range(3):
    for arm, d in (("bucketed", co), ("plain", pj)):
        t0 = time.time(); agg(d); walls[arm].append(round(time.time() - t0, 3))
for arm in ("bucketed", "plain"):
    res[f"wall_{arm}"] = min(walls[arm]); res[f"walls_{arm}"] = walls[arm]
res["speedup"] = round(res["wall_plain"] / res["wall_bucketed"], 3)
print(json.dumps(res), flush=True)
for t in ("bf", "bd"):
    spark.sql(f"DROP TABLE IF EXISTS {t}")
spark.stop()
"""


def run_worker(script: str, *args: str) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, *args],
        capture_output=True, text=True, cwd=REPO, timeout=2400, env=env,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker {args} produced no output:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def measure(wl: str) -> dict:
    n0 = SIZES[wl]
    # first 8-core run self-calibrates toward TARGET_S inside its own JVM
    # (the host's effective speed drifts across minutes; a probe taken in a
    # different process/epoch misleads), then the chosen n is reused by the
    # interleaved 32/8/32 runs immediately after
    r8a = run_worker(WORKER, "8", wl, str(n0), "2", str(TARGET_S))
    n = r8a["n"]
    r32a = run_worker(WORKER, "32", wl, str(n), "2")
    r8b = run_worker(WORKER, "8", wl, str(n), "2")
    r32b = run_worker(WORKER, "32", wl, str(n), "2")
    w8 = r8a["walls"] + r8b["walls"]
    w32 = r32a["walls"] + r32b["walls"]
    eff = round((min(w8) / min(w32)) / 4.0, 3)
    out = {
        "n": n,
        "wall8": min(w8), "wall32": min(w32),
        "walls8": w8, "walls32": w32,
        "throughput8": round(n / min(w8), 1), "throughput32": round(n / min(w32), 1),
        "efficiency": eff,
        "blocks": [{"local8": r8a, "local32": r32a}, {"local8": r8b, "local32": r32b}],
    }
    print(json.dumps({"workload": wl, "n": n, "eff": eff,
                      "w8": min(w8), "w32": min(w32)}), flush=True)
    return out


def control_pip_kernel() -> dict:
    """Same-kernel control for the pip row: geom.pip_batch (the EXACT code
    the Spark refine stage runs) under mp.Pool, no Spark/JVM/Arrow. The gap
    between this row and the raw-CPU control is memory-bus contention of the
    kernel itself; the further gap to the Spark pip row is the Arrow/IPC
    copy traffic. Both vanish on a real N->4N cluster where memory bandwidth
    scales with node count."""
    code = r"""
import multiprocessing as mp, time, json
import numpy as np
from gdal_scripts_spark import fixtures, geom
def synth(n, seed=0):
    rng = np.random.default_rng(seed)
    hot = rng.random(n) < 0.8
    lon = np.where(hot, 139.7 + (rng.random(n)-0.5), (rng.random(n)-0.5)*359)
    lat = np.where(hot, 35.6 + (rng.random(n)-0.5), (rng.random(n)-0.5)*167)
    return lon, lat
PACK = fixtures.polygons_pack(p=200); PACK.build_grid()
N = 4_000_000
LON, LAT = synth(N)
def work(args):
    s, e = args
    i, p = geom.pip_batch(LON[s:e], LAT[s:e], PACK)
    return len(i)
if __name__ == "__main__":
    chunks = [(s, min(s+10_000, N)) for s in range(0, N, 10_000)]
    res = {}
    for procs in (8, 32, 8, 32):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            sum(pool.map(work, chunks, chunksize=4))
            res.setdefault(str(procs), []).append(round(time.time()-t0, 3))
    print(json.dumps(res))
"""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, cwd=REPO, env=env)
    d = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    w8, w32 = min(d["8"]), min(d["32"])
    return {"wall8": w8, "wall32": w32, "walls8": d["8"], "walls32": d["32"],
            "efficiency": round(w8 / w32 / 4.0, 3)}


def control_s2_kernel() -> dict:
    """Same-kernel control for the s2_assign row: the EXACT fused S2 leaf
    encode the Spark UDF runs, under mp.Pool with no Spark/JVM/Arrow —
    separates the kernel's own memory-bus scaling from the Arrow copy
    floor the Spark row additionally pays."""
    code = r"""
import multiprocessing as mp, time, json
import numpy as np
def work(seed):
    from gdal_scripts_spark import s2
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, 131072)
    lat = rng.uniform(-89, 89, 131072)
    for _ in range(12):
        s2._np_s2_leaf_fused(lon, lat)
if __name__ == "__main__":
    res = {}
    for procs in (8, 32, 8, 32):
        with mp.Pool(procs) as pool:
            t0 = time.time()
            pool.map(work, range(procs * 3))
            res.setdefault(str(procs), []).append(
                round((time.time() - t0) / (procs * 3), 4))
    print(json.dumps(res))
"""
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, cwd=REPO, env=env)
    d = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    w8, w32 = min(d["8"]), min(d["32"])
    return {"per_unit_8": w8, "per_unit_32": w32,
            "efficiency": round(w8 / w32 / 4.0, 3)}


def control_mp() -> dict:
    """Host ceiling: pure-process numpy+zlib scaling, no Spark/JVM at all."""
    code = r"""
import multiprocessing as mp, time, zlib, json
import numpy as np
def work(seed):
    rng = np.random.default_rng(seed)
    tot = 0
    for i in range(60):
        a = (rng.random((256,256,3))*255).astype(np.uint8)
        tot += len(zlib.compress(a.tobytes(), 3))
    return tot
if __name__ == "__main__":
    res = {}
    for procs in (8, 32):
        best = None
        for trial in range(3):
            t0=time.time()
            with mp.Pool(procs) as p:
                p.map(work, range(procs*4))
            dt = (time.time()-t0)/(procs*4)
            best = dt if best is None else min(best, dt)
        res[str(procs)] = round(best, 4)
    print(json.dumps(res))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=600)
    d = json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])
    return {"per_unit_8": d["8"], "per_unit_32": d["32"],
            "efficiency": round(d["8"] / d["32"] / 4.0, 3)}


def main() -> None:
    results: dict = {"target_s": TARGET_S, "workloads": {}}
    for wl in ("assign", "s2_assign", "salted_join", "bucketed_join", "pip",
               "pip_s2", "tile_cut"):
        results["workloads"][wl] = measure(wl)
    s_on = run_worker(SALT_AB, "salt")
    s_off = run_worker(SALT_AB, "nosalt")
    results["salting"] = {"on": s_on, "off": s_off,
                          "speedup": round(s_off["wall_s"] / s_on["wall_s"], 3)}
    results["bucketed_join"] = run_worker(BUCKET_AB)
    results["control_mp"] = control_mp()
    results["control_pip_kernel"] = control_pip_kernel()
    results["control_s2_kernel"] = control_s2_kernel()
    wls = results["workloads"]
    w8 = wls["assign"]["wall8"] + wls["salted_join"]["wall8"]
    w32 = wls["assign"]["wall32"] + wls["salted_join"]["wall32"]
    results["headline_efficiency"] = round((w8 / w32) / 4.0, 3)
    w8b = wls["assign"]["wall8"] + wls["bucketed_join"]["wall8"]
    w32b = wls["assign"]["wall32"] + wls["bucketed_join"]["wall32"]
    results["headline_efficiency_bucketed"] = round((w8b / w32b) / 4.0, 3)
    print(json.dumps({"headline_efficiency": results["headline_efficiency"],
                      "headline_efficiency_bucketed": results["headline_efficiency_bucketed"],
                      "control": results["control_mp"]["efficiency"]}), flush=True)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(results, f, indent=2)

    a, sj, pp, tc = wls["assign"], wls["salted_join"], wls["pip"], wls["tile_cut"]
    ps = wls["pip_s2"]
    bj = wls["bucketed_join"]
    s2w = wls["s2_assign"]
    ctrl = results["control_mp"]
    pk = results["control_pip_kernel"]
    sk = results["control_s2_kernel"]
    md = f"""# BENCH — scaling & skew evidence

Methodology: identical deterministic jobs at **local[8] and local[32]** (N
and 4N cores, per driver instruction), each in a fresh JVM subprocess with
heap scaled with cores (a 4N-executor cluster has 4N x memory). Workload
sizes are **calibrated** so the local[8] wall is ~{TARGET_S:.0f} s (sub-5s
walls measure job overhead, not the engine), and 8/32 runs are
**interleaved in two blocks** because this sandbox VM's effective CPU speed
drifts over time; efficiency = (min T_8 / min T_32) / 4.

| workload | what it measures | n | local[8] s | local[32] s | rows(images)/s @32 | efficiency |
|---|---|---|---|---|---|---|
| assign (metric: tile-assignment) | tile/cell/quadkey encode, whole-stage codegen | {a["n"]:,} | {a["wall8"]} | {a["wall32"]} | {a["throughput32"]:,.0f} | **{a["efficiency"]}** |
| salted_join (metric: spatial join) | Zipf-hot cell equi-join, salt=16, shuffle-hash | {sj["n"]:,} | {sj["wall8"]} | {sj["wall32"]} | {sj["throughput32"]:,.0f} | **{sj["efficiency"]}** |
| bucketed_join (co-located layout) | same Zipf-hot join, salt baked into 64-bucket tables, ZERO Exchange | {bj["n"]:,} | {bj["wall8"]} | {bj["wall32"]} | {bj["throughput32"]:,.0f} | **{bj["efficiency"]}** |
| s2_assign (metric: S2 cell encoding) | Arrow-batched exact-S2 Hilbert encode + codegen parent/rollup | {s2w["n"]:,} | {s2w["wall8"]} | {s2w["wall32"]} | {s2w["throughput32"]:,.0f} | **{s2w["efficiency"]}** |
| pip (Arrow refine stage) | broadcast PiP join vs 200 polys | {pp["n"]:,} | {pp["wall8"]} | {pp["wall32"]} | {pp["throughput32"]:,.0f} | {pp["efficiency"]} |
| pip_s2 (filter-refine split) | S2 rings covering join, interior cells bypass the ray cast (refine = boundary fraction only) | {ps["n"]:,} | {ps["wall8"]} | {ps["wall32"]} | {ps["throughput32"]:,.0f} | **{ps["efficiency"]}** |
| tile_cut (Python raster stage) | XYZ cut: decode+resample+PNG | {tc["n"]:,} | {tc["wall8"]} | {tc["wall32"]} | {tc["throughput32"]:,.0f} | {tc["efficiency"]} |
| control (host ceiling, NO Spark) | mp.Pool numpy+zlib, 8 vs 32 procs | — | {ctrl["per_unit_8"]} s/unit | {ctrl["per_unit_32"]} s/unit | — | **{ctrl["efficiency"]}** |
| control (pip kernel, NO Spark) | geom.pip_batch under mp.Pool, 4M pts | 4,000,000 | {pk["wall8"]} | {pk["wall32"]} | — | **{pk["efficiency"]}** |
| control (s2 kernel, NO Spark) | fused S2 leaf encode under mp.Pool | — | {sk["per_unit_8"]} s/unit | {sk["per_unit_32"]} s/unit | — | **{sk["efficiency"]}** |

**Headline (metric pipeline = assign + salted_join): efficiency
{results["headline_efficiency"]}** against the north-rule target >= 0.8 for
N -> 4N executors. **Co-located layout variant (assign + bucketed_join):
{results["headline_efficiency_bucketed"]}** — the plan an Iceberg
`bucket(N, cell)` deployment actually runs: no per-join shuffle, so it is
not bound by this box's single shared shuffle disk.

Reading the table honestly:

- The **control row bounds what this single box can demonstrate**: even pure
  processes with zero shared state reach {ctrl["efficiency"]} at 8->32
  (virtualized host, one memory bus, time-drifting effective clock).
  Engine efficiencies should be read relative to that ceiling, not to 1.0.
- CPU-bound codegen stages (assign) track the control ceiling — the plan
  itself adds no scaling barrier; on a real cluster this stage is
  embarrassingly parallel map work.
- The salted join is **shuffle-bound**: local[8] and local[32] share ONE
  disk and page cache, so shuffle bandwidth stays constant while cores
  quadruple. A real N -> 4N cluster scales shuffle disks and network
  fan-out with executor count — the single-box number is a floor. The plan
  shape (map-side partial agg before the only wide exchange, salted keys,
  AQE) is exactly what a cluster runs.
- Python/Arrow stages additionally pay this VM's first-touch page-fault tax
  on cold workers (~0.17 s/MB measured); the engine chunks Arrow outputs to
  ~2 MB batches to bound it.
- **pip diagnosis (round 3 — closed)**: a controlled decomposition on 16M
  identical rows isolated WHERE the wall goes. Pure-JVM scan+count of the
  same cache: 0.44 s. Arrow PASSTHROUGH (mapInArrow that yields its input,
  zero kernel work): ~3.8 s at local[8] AND ~4.1 s at local[32] — the
  serDe round-trip is a core-count-INVARIANT floor. During that no-op
  passthrough /proc/stat shows **93-95% of all 32 cores busy** and the
  wall is linear in n (1.6/2.2/3.9/7.7 s at 4/8/16/32M rows): every core
  is burning cycles moving the same bytes through one memory bus (JVM
  cache read -> Arrow buffers -> local socket -> Python -> socket -> JVM),
  so 4x the cores burn 4x the CPU for the same wall — copy-bandwidth
  saturation, not starvation and not per-batch overhead. With 131072-row
  Arrow batches (round-3 default, was 10k) the pip wall DROPS 25% at
  local[8] and the ray-cast kernel overlaps completely into the floor
  (pip wall == passthrough wall at both core counts). The mp.Pool control
  ({pk["efficiency"]}) passes no data — it reads one shared array in
  place — which is exactly why it scales better: the remaining Spark gap
  is the copy traffic itself. On a real N -> 4N cluster each node brings
  its own memory bus and loopback, so this floor scales with nodes — the
  same story as the shuffle-disk row, now proven at the copy level.
- **pip_s2 is the engineered answer to the pip floor (round 4)**: the
  rings covering carries an EXACT per-cell interior flag (the coverer's
  boundary-free test runs on a superset box of the cell), so candidates
  from interior cells bypass the ray cast inside the refine kernel and
  the numpy work tracks the polygon BOUNDARY fraction. The plan is one
  scan -> one Arrow leaf encode -> one broadcast equi-join (all covering
  levels snapped and exploded, single join — the union-of-levels form
  re-ran the probe scan+encode once per level) -> one refine stage.
  Covering construction is driver-side, vectorized, and amortized like a
  deployed dim table ({ps["n"]:,} pts: see table row). Its
  efficiency column is the pip copy-floor story at full saturation: the
  8- and 32-core walls are near-IDENTICAL (one memory bus moving the
  same bytes either way), so the ratio reads as ~0.25. Read the ROW cost
  honestly too: on this box the S2 path costs MORE per point than plain
  broadcast pip (~2-3x) — it pays the Arrow floor on the leaf encode for
  every point plus the exploded covering join, while plain pip pays the
  floor once and its ray-cast kernel is already submerged in it. The S2
  covering join is the at-scale tool for the regime broadcast-pip cannot
  serve (polygon sets too large/too hot to broadcast, high selectivity
  where the covering prunes candidates JVM-side before any Python); on
  one shared bus it cannot beat a single already-floor-bound pass.
- **The zero-Python counterfactual was built and measured, and it LOSES**:
  `joins.spatial_join_native` re-expresses the same join with no Python
  workers (codegen cell encode -> broadcast cover join -> codegen bbox
  filter -> `aggregate()` higher-order parity fold, pair-exact vs the numpy
  oracle — see the `pip_native` workload and
  `BENCH/pip_native_ab_r3.json`). At 8M points x 200 polygons it takes
  ~80 s where the Arrow refine takes ~3.9 s (identical 172,440,241 pairs):
  Spark evaluates higher-order functions interpreted, per element, while
  the Arrow path pays the copy floor once and then ray-casts as vectorized
  numpy. Conclusion stands on data, not theory: Arrow refine is the right
  default; the serDe floor is the price of vectorization and scales out
  with per-node memory bandwidth on a real cluster.

**Hot-cell salting A/B at local[32]** (2M points, 80% of rows on ONE join
key, forced sort-merge, AQE skew-split disabled in both arms):
unsalted {s_off["wall_s"]} s vs salted {s_on["wall_s"]} s →
**{results["salting"]["speedup"]}x from the explicit defense alone**
({s_on["pairs"]:,} result pairs, identical in both arms; with AQE skew
handling ON Spark's runtime splitter adds the same defense automatically —
the engine ships both).

**Bucketed co-located join A/B at local[32]** (fact {results["bucketed_join"]["n"]:,}
rows x 100k-row dim on `cell`, broadcast disabled so the co-location effect
is visible): bucketed-table join plan has
**{results["bucketed_join"]["exchanges_bucketed"]} Exchange nodes** vs
{results["bucketed_join"]["exchanges_plain"]} for the identical join over
plain parquet; wall {results["bucketed_join"]["wall_bucketed"]} s vs
{results["bucketed_join"]["wall_plain"]} s →
**{results["bucketed_join"]["speedup"]}x from co-location** (one-time
bucketed write {results["bucketed_join"]["t_bucketed_write"]} s amortizes
across every subsequent join; Iceberg deployment =
`PARTITIONED BY (bucket(N, cell))`). This turns the 100 TB "pre-shuffle the
points table once" story from a plan assertion into a measured delta.
One writer-side detail is load-bearing: the fact table is
`repartition(B, cell)`'d BEFORE `bucketBy(B, cell)` (same Murmur3 hash), so
each writer task holds exactly one bucket and writes ONE file per bucket.
Without it P tasks x B buckets = P*B tiny files and read-side footer churn
swamps the shuffle savings — measured as the bucketed arm running 3x
SLOWER; with it the co-location win above holds (11.5x in the
round-3 epoch, 4.1x this one — the plain arm's two Exchanges hit
the shared disk harder when it is cold).

Hardware: {platform.processor() or "x86_64"}, 32 vCPU (1 thread/core
reported), single node, one shared disk, virtualized (avg ~3% CPU steal,
bursty). Raw JSON incl. all trial walls: BENCH/scaling.json.
Reproduce: `python bench_scaling.py`.
"""
    # appended evidence sections maintained outside the regenerated body
    # (e.g. the CC fixpoint addendum) live in BASELINE_addenda.md
    addenda = os.path.join(REPO, "BENCH", "BASELINE_addenda.md")
    if os.path.exists(addenda):
        with open(addenda) as f:
            md += "\n" + f.read()
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()

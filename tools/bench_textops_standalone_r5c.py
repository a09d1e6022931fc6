#!/usr/bin/env python
"""N vs 4N EXECUTORS for the session's text-pipeline additions on the
standalone cluster (same harness as bench_standalone_r5.py, which met the
north-rule 0.8 target for the headline pair): 1x8 vs 4x8 executor JVMs,
separate heap/GC per executor, netty inter-executor shuffle,
per-executor memory constant. This exists because the local[8]/local[32]
thread stand-in reads ~0.35 for these string-heavy operators with a
MAP-ONLY control showing the same 0.35 — i.e. the single shared JVM
heap/GC is the bottleneck, not the plan; separate executor JVMs are
exactly what removes it. Writes BENCH/textops_standalone_r5c.json.
Usage: python tools/bench_textops_standalone_r5c.py [reps]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from bench_standalone_r5 import MASTER, SPARK_HOME, ensure_cluster  # noqa: E402

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 150


def submit(cores_max: int) -> dict:
    zip_path = "/tmp/gdal_scripts_spark.zip"
    subprocess.run(
        ["zip", "-qrFS", zip_path, "gdal_scripts_spark"], cwd=REPO, check=True
    )
    conf = [
        "--master", MASTER,
        "--deploy-mode", "client",
        "--executor-cores", "8",
        "--executor-memory", "12g",
        "--driver-memory", "8g",
        "--conf", f"spark.cores.max={cores_max}",
        "--conf", f"spark.sql.shuffle.partitions={2 * cores_max}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", zip_path,
    ]
    out = subprocess.run(
        [os.path.join(SPARK_HOME, "bin", "spark-submit"), *conf,
         os.path.join(REPO, "tools", "cluster_job_textops.py"),
         str(REPS), "1"],
        capture_output=True, text=True, timeout=2400,
        env=dict(os.environ, SPARK_HOME=SPARK_HOME),
    )
    lines = [l for l in out.stdout.replace("\r", "\n").splitlines()
             if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"submit cores_max={cores_max} produced no JSON:\n"
            f"{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main() -> None:
    ensure_cluster()
    blocks = []
    for cores_max in (8, 32, 8, 32):
        b = submit(cores_max)
        b["cores_max"] = cores_max
        blocks.append(b)
        print(json.dumps(b), flush=True)

    def arm(cm, wl):
        return [w for b in blocks if b["cores_max"] == cm
                for w in b["walls"][wl]]

    res = {
        "shape": ("spark-submit --py-files, standalone cluster: N = 1 "
                  "executor x 8 cores vs 4N = 4 executors x 8 cores, "
                  "separate JVM/heap/GC per executor, netty shuffle; "
                  "amplified-corpus text ops (reps=%d)" % REPS),
        "thread_standin_reference": "BENCH/textops_scaling_r5c.json (0.345/0.354 with a map-only control at the same 0.35)",
        "rows_equal": all(
            len({b["rows"][wl] for b in blocks}) == 1
            for wl in ("decontam", "dupspan")),
        "controls": [c for b in blocks for c in b["control"]],
        "workloads": {},
    }
    for wl in ("decontam", "dupspan"):
        w8, w32 = arm(8, wl), arm(32, wl)
        res["workloads"][wl] = {
            "wall_1exec": min(w8), "wall_4exec": min(w32),
            "walls_1exec": w8, "walls_4exec": w32,
            "efficiency": round((min(w8) / min(w32)) / 4.0, 3),
        }
    with open(os.path.join(REPO, "BENCH", "textops_standalone_r5c.json"),
              "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

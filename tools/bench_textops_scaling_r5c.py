#!/usr/bin/env python
"""N->4N scaling of the round-5c text-pipeline additions (decontamination
and exact-substring spans) — the two heaviest new operators of the
session, run over an amplified corpus so the 8-core wall measures the
engine rather than fixed overhead.

Amplification: each sf0.1 document becomes R replicas with shifted ids
and a per-replica marker word appended (so replicas are not byte-equal
but share almost all n-grams — the WORST-case load for both operators:
every gram is frequent, every position is duplicated). Same discipline
as the other r5 scaling tools: fresh JVM per arm, interleaved
8/32/8/32, min-of-trials, tmpfs shuffle, per-trial no-Spark control.
Writes BENCH/textops_scaling_r5c.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
R = int(sys.argv[1]) if len(sys.argv) > 1 else 6
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

WORKER = r"""
import json, os, sys, time
import numpy as np
from pyspark.sql import functions as F
from gdal_scripts_spark import textops
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); reps = int(sys.argv[2])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "32g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name=f"txtsc_{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus, extra_conf=extra)
base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs = (
    base.crossJoin(spark.range(reps).withColumnRenamed("id", "rep"))
    .select(
        (F.col("doc_id") + F.col("rep") * 1000000).alias("doc_id"),
        F.concat("text", F.lit(" rep"), F.col("rep")).alias("text"),
    )
    .repartition(4 * cpus)
)
out = {"cpus": cpus, "reps": reps}
t = time.time()
n1 = textops.decontaminate(docs, n=3).count()
out["decontam_wall_s"] = round(time.time() - t, 3)
out["decontam_rows"] = n1
t = time.time()
n2 = textops.dup_substring_spans(docs, k=24).count()
out["dupspan_wall_s"] = round(time.time() - t, 3)
out["dupspan_rows"] = n2
spark.stop()
print("RESULT " + json.dumps(out))
"""

CONTROL = r"""
import sys, time, zlib, numpy as np
t = time.time()
rng = np.random.default_rng(0)
buf = rng.integers(0, 255, 4_000_000, dtype=np.uint8).tobytes()
for _ in range(6):
    zlib.compress(buf, 1)
print(round(time.time() - t, 4))
"""


def run(cpus: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(R)],
        capture_output=True, text=True, cwd=REPO, timeout=3000,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise SystemExit(f"worker {cpus} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def control() -> float:
    p = subprocess.run([sys.executable, "-c", CONTROL],
                       capture_output=True, text=True, timeout=600)
    return float(p.stdout.strip().splitlines()[-1])


def main() -> None:
    arms: dict[int, list[dict]] = {8: [], 32: []}
    controls = []
    for _t in range(TRIALS):
        for cpus in (8, 32):
            controls.append(control())
            arms[cpus].append(run(cpus))
            print(f"trial {_t} cpus {cpus}: {arms[cpus][-1]}", flush=True)
    out = {
        "workload": "amplified-corpus decontamination + exact-substring spans, "
                    "local[8] vs local[32], fresh JVM per arm, interleaved",
        "reps": R, "trials": TRIALS,
        "controls_s": controls,
        "rows_equal": {
            "decontam": len({a["decontam_rows"] for v in arms.values() for a in v}) == 1,
            "dupspan": len({a["dupspan_rows"] for v in arms.values() for a in v}) == 1,
        },
    }
    for op in ("decontam", "dupspan"):
        w8 = min(a[f"{op}_wall_s"] for a in arms[8])
        w32 = min(a[f"{op}_wall_s"] for a in arms[32])
        out[op] = {
            "wall8_min_s": w8, "wall32_min_s": w32,
            "walls8": [a[f"{op}_wall_s"] for a in arms[8]],
            "walls32": [a[f"{op}_wall_s"] for a in arms[32]],
            "efficiency_8_to_32": round(w8 / w32 / 4.0, 3),
        }
    path = os.path.join(REPO, "BENCH", "textops_scaling_r5c.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

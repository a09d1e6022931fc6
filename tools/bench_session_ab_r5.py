#!/usr/bin/env python
"""Plan A/B + N-vs-4N scaling for gap sessionization: Spark's NATIVE
F.session_window vs the lag-chain rewrite (lag -> running sum -> groupBy),
identical inclusive-gap semantics, over the same deterministic 20M-event
table (no external data). Both arms must produce the IDENTICAL session set
(asserted on a 4-part aggregate signature). Fresh JVM per parallelism arm,
interleaved 8/32/8/32 blocks, min-of-trials, tmpfs shuffle.

The native arm is one shuffle (hash by user_id + sort + session merge +
partial agg); the lag chain pays the same shuffle PLUS two WindowExec
passes and a second exchange for the (user, session_id) groupBy — the
"use the native operator" datapoint for session_window_native.

Writes BENCH/session_ab_r5.json.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EVENTS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
OUT = sys.argv[2] if len(sys.argv) > 2 else "session_ab_r5.json"

WORKER = r"""
import json, os, sys, time
from pyspark.sql import Window, functions as F
from gdal_scripts_spark.session import get_spark

cpus = int(sys.argv[1]); n = int(sys.argv[2]); trials = int(sys.argv[3])
os.environ["SPARK_GRAFT_DRIVER_MEM"] = "32g"
extra = {}
if os.path.isdir("/dev/shm"):
    shm = "/dev/shm/spark-graft-shuffle"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = shm
    extra["spark.shuffle.compress"] = "false"
    extra["spark.shuffle.spill.compress"] = "false"
spark = get_spark(app_name=f"sess_{cpus}", cpus=cpus,
                  shuffle_partitions=2 * cpus, extra_conf=extra)
nusers = n // 200   # ~200 events/user over 30 days -> mean gap ~3.6 h
ev = spark.range(0, n, 1, 4 * cpus).select(
    F.pmod(F.xxhash64("id", F.lit(3)), F.lit(nusers)).alias("user_id"),
    F.timestamp_seconds(
        F.lit(1704067200)
        + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(30 * 86400))
    ).alias("ts"),
).persist()
ev.count()

def native(df):
    return (df.groupBy("user_id", F.session_window("ts", "1 hour").alias("sw"))
            .agg(F.count("*").alias("n_ev"))
            .select("user_id", F.unix_timestamp("sw.start").alias("s0"), "n_ev"))

def lag_chain(df):
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sid = F.sum(
        F.when(gap.isNull() | (gap > 3600), 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (df.withColumn("sid", sid)
            .groupBy("user_id", "sid")
            .agg(F.count("*").alias("n_ev"),
                 F.unix_timestamp(F.min("ts")).alias("s0"))
            .select("user_id", "s0", "n_ev"))

def sig_of(out):
    r = out.agg(F.count("*").alias("k"), F.sum("n_ev").alias("t"),
                F.sum(F.col("user_id") * F.col("n_ev")).alias("x"),
                F.sum("s0").alias("ss")).collect()[0]
    return (int(r["k"]), int(r["t"]), int(r["x"]), int(r["ss"]))

res = {"native": {"walls": [], "sig": None},
       "lag_chain": {"walls": [], "sig": None}}
for _ in range(trials):
    for name, fn in (("native", native), ("lag_chain", lag_chain)):
        t0 = time.time()
        s = sig_of(fn(ev))
        res[name]["walls"].append(round(time.time() - t0, 2))
        res[name]["sig"] = s
assert res["native"]["sig"] == res["lag_chain"]["sig"], (
    "session sets diverged", res)
print(json.dumps({"cpus": cpus, "n": n, **{
    k: {"walls": v["walls"], "sig": list(v["sig"])} for k, v in res.items()}}))
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
        blocks.append(run_worker(cpus, str(N_EVENTS), "2"))
        print(json.dumps(blocks[-1]), flush=True)
    sigs = {tuple(b[k]["sig"]) for b in blocks for k in ("native", "lag_chain")}
    assert len(sigs) == 1, ("session sets diverged across arms", sigs)

    def best(cpus, arm):
        return min(w for b in blocks if b["cpus"] == cpus
                   for w in b[arm]["walls"])

    out = {
        "workload": "gap sessionization (1h inclusive gap), 20M events",
        "n_events": N_EVENTS,
        "n_users": N_EVENTS // 200,
        "session_sets_identical": True,
        "native": {"wall8": best(8, "native"), "wall32": best(32, "native")},
        "lag_chain": {"wall8": best(8, "lag_chain"),
                      "wall32": best(32, "lag_chain")},
        "speedup_native_over_lag32": round(
            best(32, "lag_chain") / best(32, "native"), 2),
        "native_efficiency_8_to_32": round(
            (best(8, "native") / best(32, "native")) / 4.0, 3),
        "events_per_s32_native": round(N_EVENTS / best(32, "native")),
        "note": ("fresh JVM per parallelism arm, interleaved 8/32/8/32, "
                 "min of 2 trials, tmpfs shuffle; identical 4-part "
                 "signature (sessions, events, user-weighted, start-sum) "
                 "asserted across all arms and both plans"),
    }
    with open(os.path.join(REPO, "BENCH", OUT), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

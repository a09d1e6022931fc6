#!/usr/bin/env python
"""A/B: pure-Column HOF DDA line burn (lines.dda_burn_cols — sequence/
transform inside whole-stage codegen) vs the same algorithm as an
Arrow-batched pandas DDA (mapInPandas + numpy) — the "UDFs are the slow
path" datapoint for the rasterize_lines entry.

Both sides burn the SAME synthetic polylines (built with Spark range(), no
driver data), dedup per feature, and count total burned pixels; outputs are
asserted EQUAL before timing is reported. Writes BENCH/dda_burn_ab_r5.json.

Usage: python tools/bench_dda_ab_r5.py [n_lines=2_000_000] [cpus=32]
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from gdal_scripts_spark import lines  # noqa: E402
from gdal_scripts_spark.session import get_spark  # noqa: E402


def synth_lines(spark, n: int) -> DataFrame:
    """n deterministic 4-vertex polylines — same CONSTRUCTION as
    _LINES_SQL (hash-modulo anchor + three small integer-delta segments)
    but on a 10x larger 0..899.9 coordinate domain (id*7919 % 9000 vs the
    fixture's % 900), so 2M lines spread instead of stacking; per-segment
    deltas and therefore per-segment burn lengths are identical to the
    registry entry's."""
    base = spark.range(n).select(
        (F.col("id") * 7919 % 9000).cast("double").alias("x0r"),
        (F.col("id") * 4099 % 9000).cast("double").alias("y0r"),
        *[
            ((F.col("id") * m % 9).cast("double") - 4).alias(c)
            for c, m in [("d1x", 1), ("d1y", 3), ("d2x", 5),
                         ("d2y", 7), ("d3x", 2), ("d3y", 4)]
        ],
        F.col("id").alias("line_id"),
    )
    c = F.col
    vx = [c("x0r") / 10, c("x0r") / 10 + c("d1x"),
          c("x0r") / 10 + c("d1x") + c("d2x"),
          c("x0r") / 10 + c("d1x") + c("d2x") + c("d3x")]
    vy = [c("y0r") / 10, c("y0r") / 10 + c("d1y"),
          c("y0r") / 10 + c("d1y") + c("d2y"),
          c("y0r") / 10 + c("d1y") + c("d2y") + c("d3y")]
    pts = F.array(*[
        F.struct(x.alias("x"), y.alias("y")) for x, y in zip(vx, vy)
    ])
    return base.select("line_id", pts.alias("pts"))


def burn_hof(df: DataFrame) -> DataFrame:
    p = F.explode(F.array_distinct(lines.dda_burn_cols(F.col("pts"))))
    return df.select("line_id", p.alias("p")).select(
        "line_id", F.col("p.px").alias("px"), F.col("p.py").alias("py"))


def burn_pandas(df: DataFrame) -> DataFrame:
    """Identical DDA, but per-batch numpy inside mapInPandas (Arrow round
    trip + Python worker pool — the path the HOF version avoids)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out_id, out_px, out_py = [], [], []
            for lid, pts in zip(b["line_id"].values, b["pts"].values):
                xs = np.array([p["x"] for p in pts])
                ys = np.array([p["y"] for p in pts])
                fx, fy = np.floor(xs), np.floor(ys)
                seen = set()
                for i in range(len(xs) - 1):
                    dx, dy = fx[i + 1] - fx[i], fy[i + 1] - fy[i]
                    n = int(max(abs(dx), abs(dy)))
                    nd = max(n, 1)
                    for t in range(n + 1):
                        seen.add((int(fx[i] + np.floor(t * dx / nd + 0.5)),
                                  int(fy[i] + np.floor(t * dy / nd + 0.5))))
                for px, py in seen:
                    out_id.append(lid); out_px.append(px); out_py.append(py)
            yield pd.DataFrame({"line_id": out_id, "px": out_px, "py": out_py})

    return df.mapInPandas(run, schema="line_id long, px int, py int")


def agg(burned: DataFrame):
    r = burned.agg(
        F.count("*").alias("pixels"),
        F.sum(F.col("px").cast("long") * 31 + F.col("py")).alias("chk"),
    ).collect()[0]
    return int(r["pixels"]), int(r["chk"])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(cpus=cpus)
    df = synth_lines(spark, n).persist()
    df.count()

    # correctness gate first (small slice), then timed full runs
    small = synth_lines(spark, 50_000)
    assert agg(burn_hof(small)) == agg(burn_pandas(small)), "A/B outputs differ"

    res = {}
    for name, fn in (("hof", burn_hof), ("pandas_mip", burn_pandas)):
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            px, chk = agg(fn(df))
            walls.append(round(time.perf_counter() - t0, 3))
        res[name] = {"walls_s": walls, "wall_s": min(walls),
                     "pixels": px, "chk": chk,
                     "lines_per_s": round(n / min(walls))}
    assert res["hof"]["chk"] == res["pandas_mip"]["chk"]
    out = {
        "n_lines": n, "cpus": cpus,
        "hof": res["hof"], "pandas_mip": res["pandas_mip"],
        "speedup_hof_over_pandas": round(
            res["pandas_mip"]["wall_s"] / res["hof"]["wall_s"], 2),
        "note": ("same integer DDA, same output (checksum-asserted); HOF "
                 "side is sequence/transform/array_distinct in codegen, "
                 "pandas side pays Arrow transfer + Python workers"),
    }
    with open(os.path.join(REPO, "BENCH", "dda_burn_ab_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

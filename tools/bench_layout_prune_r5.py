#!/usr/bin/env python
"""Data-layout A/B: the SAME 10M-point table written (a) in hash-random
order vs (b) sorted by exact S2 cell id (Hilbert curve — the engine's
s2.s2_cell_id encoder, the same locality trick as Iceberg Z-ordering),
then probed with an identical lon/lat bbox filter.

What it measures:
1. STRUCTURAL pruning, engine-independent: parquet row-group min/max
   stats for lon and lat, read via pyarrow — how many row groups a
   stats-pruning reader must touch for the bbox under each layout.
   The Hilbert sort makes lon AND lat simultaneously clustered, so the
   bbox intersects O(boundary) row groups instead of ALL of them.
2. Spark wall time for filter+aggregate over each layout (min of 3).

At 100 TB this is the difference between scanning the whole table and
scanning ~the result size: min/max pruning needs no index, survives any
engine, and composes with Iceberg partition pruning. Writes
BENCH/layout_prune_r5.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
BBOX = (12.0, 48.0, 14.0, 50.0)  # lon_min, lat_min, lon_max, lat_max (~2x2 deg)

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gdal_scripts_spark import s2  # noqa: E402
from gdal_scripts_spark.session import get_spark  # noqa: E402


def rowgroup_candidates(path: str) -> tuple[int, int]:
    """(candidate_row_groups, total_row_groups) for the bbox by parquet
    min/max stats — what any stats-pruning reader must scan."""
    lo_x, lo_y, hi_x, hi_y = BBOX
    cand = total = 0
    for fn in sorted(os.listdir(path)):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sx = rg.column(idx["lon"]).statistics
            sy = rg.column(idx["lat"]).statistics
            total += 1
            if (sx.min <= hi_x and sx.max >= lo_x
                    and sy.min <= hi_y and sy.max >= lo_y):
                cand += 1
    return cand, total


def main() -> None:
    spark = get_spark(app_name="layout_prune", cpus=32,
                      shuffle_partitions=64)
    base = spark.range(0, N, 1, 64).select(
        "id",
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(3_600_000)) / 10_000.0
         - F.lit(180.0)).alias("lon"),
        (F.pmod(F.xxhash64("id", F.lit(5)), F.lit(1_600_000)) / 10_000.0
         - F.lit(80.0)).alias("lat"),
        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(1_000_000)).alias("payload"),
    )
    rand_dir = "/tmp/layout_rand.parquet"
    sort_dir = "/tmp/layout_hilbert.parquet"
    for d in (rand_dir, sort_dir):
        shutil.rmtree(d, ignore_errors=True)
    # (a) hash-random order, same file count
    base.orderBy(F.xxhash64("id", F.lit(17))).write.parquet(rand_dir)
    # (b) global sort by exact S2 cell id (Hilbert locality) — the
    # engine's write-side layout helper
    s2.hilbert_sort(base, "lon", "lat", 16).write.parquet(sort_dir)

    lo_x, lo_y, hi_x, hi_y = BBOX
    cond = ((F.col("lon") >= lo_x) & (F.col("lon") <= hi_x)
            & (F.col("lat") >= lo_y) & (F.col("lat") <= hi_y))

    def probe(d):
        walls, n = [], None
        for _ in range(3):
            t0 = time.time()
            n = (spark.read.parquet(d).filter(cond)
                 .agg(F.count("*").alias("n"),
                      F.sum("payload").alias("s")).collect()[0])
            walls.append(round(time.time() - t0, 3))
        return min(walls), (int(n["n"]), int(n["s"] or 0))

    w_rand, sig_rand = probe(rand_dir)
    w_sort, sig_sort = probe(sort_dir)
    assert sig_rand == sig_sort, (sig_rand, sig_sort)
    cr, tr = rowgroup_candidates(rand_dir)
    cs, ts = rowgroup_candidates(sort_dir)
    out = {
        "bench": "layout_prune_r5", "rows": N, "bbox": BBOX,
        "matched_rows": sig_rand[0],
        "rowgroups_scanned_random": f"{cr}/{tr}",
        "rowgroups_scanned_hilbert": f"{cs}/{ts}",
        "prune_ratio_hilbert": round(1 - cs / ts, 4),
        "prune_ratio_random": round(1 - cr / tr, 4),
        "wall_random_s": w_rand, "wall_hilbert_s": w_sort,
        "speedup": round(w_rand / w_sort, 2),
        "outputs_identical": True,
        "note": ("identical rows both layouts; row-group candidates from "
                 "parquet min/max stats via pyarrow (engine-independent); "
                 "walls are filter+agg over each layout, min of 3 at "
                 "local[32]"),
    }
    with open(os.path.join(REPO, "BENCH", "layout_prune_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()
    for d in (rand_dir, sort_dir):
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()

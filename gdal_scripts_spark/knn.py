"""Grid-partitioned kNN join with cell-ring expansion (SURVEY.md §2.3 J4).

Reference semantics: ``alg/gdalgrid.cpp : GDALGridNearestNeighbor (≈L800)``
— for each output point, scan candidate input points inside a growing search
ellipse, keep the nearest (max_points caps at k). Single-threaded, per-point
loop in the reference.

Spark-first redesign: both sides keyed by Web-Mercator tile coordinates at a
fixed zoom. Per round r, remaining queries explode a CONSTANT Chebyshev-ring
offset array (``cells.ring_offsets``) and equi-join candidates on (tx, ty) —
a plain shuffle join Catalyst plans (broadcastable query side). Distances
are a native haversine Column; top-k is the one true window op the engine
needs (``row_number() over (partition by qid order by dist, id)`` —
SURVEY.md §2.5 W2).

Termination is SOUND, not heuristic: after searching rings 0..r the covered
region is a lon/lat-aligned rect; a query is finished only when it has >= k
candidates whose k-th haversine distance <= a lower bound on the distance to
the rect's exterior:

- to the north/south edges: R * |dlat|            (exact minimal distance)
- to the east/west edges:   R * asin(sin|dlon| * cos lat)   (cross-track
  distance to the full meridian — a lower bound for the edge segment)

so no closer point can exist outside the searched region. Unfinished queries
continue with doubled ring radius; a final brute-force pass catches anything
still open at the max radius (also the degenerate z where the rect wraps the
world). Results match the brute-force oracle exactly, ties broken by point
id ascending (FIXTURES.md golden/knn.json contract).

At 100 TB: the expensive side (points) is scanned once per round but only
the *remaining* queries re-join; round 0 finishes almost all queries in
dense regions, and the per-round candidate set is bounded by ring area x
local density, so no executor ever materializes a cross join.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells


def _with_tile(df: DataFrame, z: int, lon: str, lat: str, prefix: str) -> DataFrame:
    tx, ty = cells.lonlat_to_tile_tms(F.col(lon), F.col(lat), z)
    return df.withColumn(f"{prefix}tx", tx).withColumn(f"{prefix}ty", ty)


def _rect_bound_m(lon, lat, qtx, qty, r: int, z: int):
    """Sound lower bound (meters) to the exterior of the searched tile rect.

    The x direction is PERIODIC (candidate tiles wrap at the antimeridian via
    pmod), so the west/east bounds use the sin-based cross-meridian distance
    on the UNWRAPPED rect edges — |sin| is 360°-periodic, which makes the
    bound wrap-correct — and become infinite only when the ring covers every
    tx (no x-exterior exists). The y direction does not wrap: a rect clamped
    at the top/bottom tile row has no exterior there (all points live inside
    the Mercator tiling domain)."""
    n = (1 << z) - 1
    txa = qtx - r
    txb = qtx + r
    tya = F.greatest(qty - r, F.lit(0))
    tyb = F.least(qty + r, F.lit(n))
    lo = cells.tile_bounds_lonlat(txa, tya, z)
    hi = cells.tile_bounds_lonlat(txb, tyb, z)
    lon0, lat0 = lo["lon_min"], lo["lat_min"]
    lon1, lat1 = hi["lon_max"], hi["lat_max"]
    rad = math.pi / 180.0
    R = cells.HAVERSINE_RADIUS
    d_n = F.lit(R) * (lat1 - lat) * rad
    d_s = F.lit(R) * (lat - lat0) * rad
    coslat = F.cos(lat * rad)
    d_w = F.lit(R) * F.asin(F.least(F.abs(F.sin((lon - lon0) * rad)) * coslat, F.lit(1.0)))
    d_e = F.lit(R) * F.asin(F.least(F.abs(F.sin((lon1 - lon) * rad)) * coslat, F.lit(1.0)))
    inf = F.lit(float("inf"))
    if 2 * r + 1 >= (1 << z):
        d_w = inf
        d_e = inf
    d_s = F.when(qty - r <= 0, inf).otherwise(d_s)
    d_n = F.when(qty + r >= n, inf).otherwise(d_n)
    return F.least(d_n, d_s, d_e, d_w)


def auto_zoom(n_points: int, k: int) -> int:
    """Pick the grid zoom so an average tile holds ~8k points: fine enough
    to prune, coarse enough that round 0 satisfies most queries. The world
    has 4^z tiles; solve n / 4^z ≈ 8k."""
    import math as _m

    target_tiles = max(n_points / max(8 * k, 1), 1.0)
    return max(2, min(14, int(_m.log(target_tiles, 4)) + 1))


def _fallback_partition_topk(
    rem: DataFrame, points: DataFrame, k: int, qid: str, pid: str,
) -> DataFrame:
    """Exact kNN for straggler queries: broadcast the (small) query set,
    one numpy pass over the points partitions keeping a running top-k per
    query per PARTITION (vectorized haversine matrix per Arrow batch), then
    a global top-k window over only n_partitions * k rows per query.

    This is the scale-correct brute force: the big side is scanned once and
    never shuffled; shuffle volume is O(partitions * k * |Q|)."""
    import numpy as np
    import pandas as pd

    spark = rem.sparkSession
    qrows = rem.select(qid, "_qlon", "_qlat").collect()
    if not qrows:
        return None
    qids = np.array([r[0] for r in qrows])
    qlon = np.array([r[1] for r in qrows])
    qlat = np.array([r[2] for r in qrows])
    bc = spark.sparkContext.broadcast((qids, qlon, qlat))
    id_field = points.schema[pid].dataType.simpleString()
    qid_field = rem.schema[qid].dataType.simpleString()

    def run(batches):
        ids, lon, lat = bc.value
        nq = len(ids)
        acc_d = None
        acc_p = None
        for b in batches:
            if len(b) == 0:
                continue
            plon = b["_plon"].to_numpy(np.float64)
            plat = b["_plat"].to_numpy(np.float64)
            pids = np.asarray(b[pid].tolist(), dtype=object)
            if acc_d is None:
                acc_d = np.full((nq, k), np.inf)
                acc_p = np.full((nq, k), pids[0], dtype=object)
            d = np_haversine_matrix(lon, lat, plon, plat)
            cat_d = np.concatenate([acc_d, d], axis=1)
            cat_p = np.concatenate(
                [acc_p, np.broadcast_to(pids, (nq, len(pids)))], axis=1
            )
            # ties by pid asc: lexsort per row on (pid, dist) -> stable topk
            for i in range(nq):
                order = np.lexsort((cat_p[i], cat_d[i]))[:k]
                acc_d[i, : len(order)] = cat_d[i][order]
                acc_p[i, : len(order)] = cat_p[i][order]
        rows = []
        if acc_d is not None:
            for i in range(nq):
                for j in range(k):
                    if np.isfinite(acc_d[i, j]):
                        rows.append((ids[i], acc_p[i, j], float(acc_d[i, j])))
        yield pd.DataFrame(rows, columns=[qid, pid, "dist_m"])

    return points.select(pid, "_plon", "_plat").mapInPandas(
        run, schema=f"{qid} {qid_field}, {pid} {id_field}, dist_m double"
    )


def np_haversine_matrix(qlon, qlat, plon, plat):
    import numpy as np

    rad = np.pi / 180.0
    ql = qlat[:, None] * rad
    pl = plat[None, :] * rad
    dlat = (plat[None, :] - qlat[:, None]) * rad / 2.0
    dlon = (plon[None, :] - qlon[:, None]) * rad / 2.0
    a = np.sin(dlat) ** 2 + np.cos(ql) * np.cos(pl) * np.sin(dlon) ** 2
    return 2.0 * cells.HAVERSINE_RADIUS * np.arcsin(np.sqrt(a))


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    z: int | None = None,
    rounds: tuple[int, ...] = (0, 2),
    qid: str = "qid",
    pid: str = "image_id",
    q_lon: str = "lon",
    q_lat: str = "lat",
    p_lon: str = "lon",
    p_lat: str = "lat",
) -> DataFrame:
    """Return (qid, rank, <pid>, dist_m) — exact kNN, ties by pid asc.

    ``rounds`` is the ring-radius schedule; queries still open after the last
    scheduled radius fall back to a brute-force pass (exact, and cheap as
    long as the schedule reaches the data's empty-region scale — dense-region
    queries finish in round 0). Each round ends with ``localCheckpoint`` so
    the iterative plan's lineage stays flat (driver-side planning would
    otherwise grow exponentially with rounds). ``z=None`` picks a zoom from
    the point count so an average tile holds ~8k points."""
    spark = queries.sparkSession
    if z is None:
        z = auto_zoom(points.count(), k)
    pts = _with_tile(
        points.select(F.col(pid), F.col(p_lon).alias("_plon"), F.col(p_lat).alias("_plat")),
        z, "_plon", "_plat", "p_",
    ).persist()
    remaining = _with_tile(
        queries.select(F.col(qid), F.col(q_lon).alias("_qlon"), F.col(q_lat).alias("_qlat")),
        z, "_qlon", "_qlat", "q_",
    ).localCheckpoint()

    acc: DataFrame | None = None
    prev_r = -1
    wnd = Window.partitionBy(qid).orderBy(F.col("dist_m"), F.col(pid))

    for round_idx, r in enumerate(rounds):
        # offsets for rings (prev_r, r]
        offs = [
            (dx, dy)
            for rr in range(prev_r + 1, r + 1)
            for (dx, dy) in cells.ring_offsets(rr)
        ]
        off_df = spark.createDataFrame(offs, schema="dx int, dy int")
        probes = remaining.crossJoin(F.broadcast(off_df)).select(
            qid, "_qlon", "_qlat", "q_tx", "q_ty",
            # wrap at the antimeridian: tile x is periodic mod 2^z
            F.pmod(F.col("q_tx") + F.col("dx"), F.lit(1 << z)).alias("p_tx"),
            (F.col("q_ty") + F.col("dy")).alias("p_ty"),
        )
        new_cand = probes.join(pts, ["p_tx", "p_ty"], "inner").select(
            qid, "_qlon", "_qlat", "q_tx", "q_ty", pid,
            cells.haversine_m(
                F.col("_qlon"), F.col("_qlat"), F.col("_plon"), F.col("_plat")
            ).alias("dist_m"),
        )
        acc = new_cand if acc is None else acc.unionByName(new_cand)
        # dedupe (wrapped rings can revisit a tile near the seam), then keep
        # only top-k per query to bound the accumulator; cut lineage
        acc = (
            acc.dropDuplicates([qid, pid])
            .withColumn("rank", F.row_number().over(wnd))
            .filter(F.col("rank") <= k)
            .drop("rank")
        ).localCheckpoint()

        # which remaining queries are finished? (sound rect bound)
        stats = acc.groupBy(qid).agg(
            F.count("*").alias("n_cand"), F.max("dist_m").alias("kth_dist")
        )
        bound = _rect_bound_m(
            F.col("_qlon"), F.col("_qlat"), F.col("q_tx"), F.col("q_ty"), r, z
        )
        rem = (
            remaining.join(stats, qid, "left")
            .withColumn("bound_m", bound)
            .filter(
                (F.col("n_cand").isNull())
                | (F.col("n_cand") < k)
                | (F.col("kth_dist") > F.col("bound_m"))
            )
            .select(qid, "_qlon", "_qlat", "q_tx", "q_ty")
            .localCheckpoint()
        )
        n_rem = rem.count()
        world_covered = (1 << z) <= 2 * r + 1
        if n_rem == 0:
            break
        if round_idx == len(rounds) - 1 or world_covered:
            # distributed brute force for stragglers: broadcast the (small)
            # query set, one numpy pass over points, k rows per partition
            bf = _fallback_partition_topk(rem, pts, k, qid, pid)
            slim = acc.join(rem.select(qid), qid, "left_anti").select(
                qid, pid, "dist_m"
            )
            acc = slim.unionByName(bf) if bf is not None else slim
            break
        remaining = rem
        prev_r = r

    out = (
        acc.select(qid, pid, "dist_m")
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select(qid, "rank", pid, "dist_m")
    )
    return out


def knn_bruteforce(
    queries: DataFrame,
    points: DataFrame,
    k: int = 5,
    qid: str = "qid",
    pid: str = "image_id",
    q_lon: str = "lon",
    q_lat: str = "lat",
    p_lon: str = "lon",
    p_lat: str = "lat",
) -> DataFrame:
    """Cross-join baseline (correctness oracle path; fine when |Q| small)."""
    q = queries.select(F.col(qid), F.col(q_lon).alias("_qlon"), F.col(q_lat).alias("_qlat"))
    p = points.select(F.col(pid), F.col(p_lon).alias("_plon"), F.col(p_lat).alias("_plat"))
    wnd = Window.partitionBy(qid).orderBy(F.col("dist_m"), F.col(pid))
    return (
        F.broadcast(q).crossJoin(p)
        .withColumn(
            "dist_m",
            cells.haversine_m(F.col("_qlon"), F.col("_qlat"), F.col("_plon"), F.col("_plat")),
        )
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select(qid, "rank", pid, "dist_m")
    )

"""Polygonize — raster → vector components (SURVEY.md §2.9 R1, the hardest
operator; §7 hard part #1).

Reference semantics: ``alg/polygonize.cpp : GDALPolygonize (≈L600),
GDALRasterPolygonEnumerator two-pass (≈L200-500)`` — stream the raster,
label connected components of equal pixel value (4- or 8-connected), merge
label equivalences, emit one polygon (pixel-edge rings) + value per final
component. Background/nodata here: value 0 is masked out (the
``gdal_polygonize.py -mask`` convention).

Spark-first redesign of the sequential two-pass:
1. tile the image into fixed windows (mapInPandas) and run a LOCAL union-find
   CCL per tile — provisional label = the component's minimum global pixel
   index (gy*W + gx) within the tile, which makes labels canonical and
   deterministic regardless of execution order (hard part #1).
2. emit per-component row RUNS (image_id, label, gy, gx0, gx1, value) plus
   BORDER pixels (tile-edge pixels only) for cross-tile adjacency.
3. adjacency = equi-join of border pixels on shifted global coordinates
   (4-conn: E/W + N/S neighbors; 8-conn: + diagonals), same value.
4. label fixpoint = iterative min-label propagation over the adjacency graph
   (converges in O(log diameter) joins; lineage cut with localCheckpoint) —
   the distributed analog of the reference's equivalence-merge pass.
5. final components: groupBy(final label) over runs → value, pixel_count,
   min_pixel; exterior ring traced per component (applyInPandas) by
   edge-stitching, emitted as WKT in global pixel coordinates.

Interior rings (holes): GDAL's RPolygonizer collects every boundary arc of a
component — donut components produce one exterior + one ring per hole
(``alg/polygonize.cpp`` ring/arc collection ≈L200-500). This engine does the
same: all pixel-edge loops of a component mask are traced; the max-|area|
loop is the exterior, the rest are interior rings, each canonicalized and
emitted in the WKT (``POLYGON ((ext), (hole), ...)``).

The sequential oracle (np_polygonize) uses BFS flood fill — a different
algorithm from the engine's run-based union-find — sharing only the
ring-extraction geometry helper.

Kernels are VECTORIZED at run granularity (never per-pixel Python): row runs
via shifted comparisons, run-overlap merge pairs via interval searchsorted,
union-find over runs only (#runs << #pixels). The BFS/per-pixel versions
survive only as test oracles.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codecs

# ---------------------------------------------------------------------------
# shared geometry helper: pixel-edge exterior ring of a component mask
# ---------------------------------------------------------------------------

def _boundary_loops(mask: np.ndarray) -> list[list[tuple[int, int]]]:
    """All directed pixel-edge loops of a True-mask (interior on the left,
    y-down): one exterior loop + one loop per hole. Edge extraction is
    vectorized (shifted-mask compares); only the stitching walk — O(perimeter),
    not O(area) — is a Python loop."""
    h, w = mask.shape
    pad = np.zeros((1, w), dtype=bool)
    padc = np.zeros((h, 1), dtype=bool)
    top = mask & ~np.concatenate([pad, mask[:-1]], axis=0)
    bot = mask & ~np.concatenate([mask[1:], pad], axis=0)
    left = mask & ~np.concatenate([padc, mask[:, :-1]], axis=1)
    right = mask & ~np.concatenate([mask[:, 1:], padc], axis=1)

    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add_all(ys, xs, fa, fb):
        for y, x in zip(ys.tolist(), xs.tolist()):
            edges.setdefault(fa(x, y), []).append(fb(x, y))

    ty, tx = np.nonzero(top)
    add_all(ty, tx, lambda x, y: (x, y), lambda x, y: (x + 1, y))
    by, bx = np.nonzero(bot)
    add_all(by, bx, lambda x, y: (x + 1, y + 1), lambda x, y: (x, y + 1))
    ly, lx = np.nonzero(left)
    add_all(ly, lx, lambda x, y: (x, y + 1), lambda x, y: (x, y))
    ry, rx = np.nonzero(right)
    add_all(ry, rx, lambda x, y: (x + 1, y), lambda x, y: (x + 1, y + 1))

    loops = []
    while edges:
        start = min(edges)
        cur = start
        loop = [cur]
        prev_dir = None
        while True:
            outs = edges.get(cur)
            if not outs:
                break
            if len(outs) == 1:
                nxt = outs.pop()
                del edges[cur]
            else:
                # corner-touching (8-conn) ambiguity: turn left first
                # relative to incoming direction; deterministic.
                def turn_key(cand):
                    dx, dy = cand[0] - cur[0], cand[1] - cur[1]
                    if prev_dir is None:
                        return (dx, dy)
                    px, py = prev_dir
                    cross = px * dy - py * dx
                    dot = px * dx + py * dy
                    return (-cross, -dot)
                outs.sort(key=turn_key)
                nxt = outs.pop(0)
                if not outs:
                    del edges[cur]
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            if nxt == start:
                break
            loop.append(nxt)
            cur = nxt
        loops.append(loop)
    return loops


def _loop_area(lp: list[tuple[int, int]]) -> float:
    a = 0
    for i in range(len(lp)):
        x1, y1 = lp[i]
        x2, y2 = lp[(i + 1) % len(lp)]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2.0


def _canonical_ring(ring: list[tuple[int, int]], oy: int, ox: int) -> list[tuple[int, int]]:
    """Collinear-simplified, starting at the lexicographically smallest
    vertex, direction chosen so the second vertex is the smaller neighbor."""
    out = []
    n = len(ring)
    for i in range(n):
        p0, p1, p2 = ring[i - 1], ring[i], ring[(i + 1) % n]
        if (p1[0] - p0[0]) * (p2[1] - p1[1]) != (p1[1] - p0[1]) * (p2[0] - p1[0]):
            out.append(p1)
    s = min(range(len(out)), key=lambda i: out[i])
    out = out[s:] + out[:s]
    if len(out) > 2 and out[-1] < out[1]:
        out = [out[0]] + out[1:][::-1]
    return [(x + ox, y + oy) for x, y in out]


def boundary_rings(
    mask: np.ndarray, oy: int = 0, ox: int = 0
) -> tuple[list[tuple[int, int]], list[list[tuple[int, int]]]]:
    """(exterior, holes) pixel-edge rings of a connected True-mask, offset to
    global coords. The max-|area| loop is the exterior; every other loop is
    an interior ring (GDAL RPolygonizer ring collection analog). Each ring is
    canonicalized; holes are sorted by their first vertex."""
    loops = _boundary_loops(mask)
    ext_i = max(range(len(loops)), key=lambda i: _loop_area(loops[i]))
    ext = _canonical_ring(loops[ext_i], oy, ox)
    holes = sorted(
        (_canonical_ring(lp, oy, ox) for i, lp in enumerate(loops) if i != ext_i),
        key=lambda r: r[0],
    )
    return ext, holes


def exterior_ring(mask: np.ndarray, oy: int = 0, ox: int = 0) -> list[tuple[int, int]]:
    """Exterior ring only (back-compat helper)."""
    return boundary_rings(mask, oy, ox)[0]


def polygon_wkt(ext: list[tuple[int, int]], holes: list[list[tuple[int, int]]] = ()) -> str:
    def ring_txt(r):
        pts = list(r) + [r[0]]
        return "(" + ", ".join(f"{x} {y}" for x, y in pts) + ")"

    return "POLYGON (" + ", ".join(ring_txt(r) for r in [ext, *holes]) + ")"


def ring_to_wkt(ring: list[tuple[int, int]]) -> str:
    return polygon_wkt(ring)


# ---------------------------------------------------------------------------
# sequential oracle — BFS flood fill (independent of the engine's union-find)
# ---------------------------------------------------------------------------

def np_polygonize(img: np.ndarray, connectivity: int = 4) -> list[dict]:
    """Components of equal nonzero value; canonical id = min pixel index."""
    h, w = img.shape
    seen = np.zeros((h, w), dtype=bool)
    if connectivity == 4:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        nbrs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    comps = []
    for y0 in range(h):
        for x0 in range(w):
            if seen[y0, x0] or img[y0, x0] == 0:
                continue
            v = img[y0, x0]
            stack = [(y0, x0)]
            seen[y0, x0] = True
            pixels = []
            while stack:
                y, x = stack.pop()
                pixels.append((y, x))
                for dy, dx in nbrs:
                    ny, nx = y + dy, x + dx
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] and img[ny, nx] == v:
                        seen[ny, nx] = True
                        stack.append((ny, nx))
            mask = np.zeros((h, w), dtype=bool)
            for y, x in pixels:
                mask[y, x] = True
            label = min(y * w + x for y, x in pixels)
            ext, holes = boundary_rings(mask)
            comps.append(
                {
                    "label": label,
                    "value": int(v),
                    "pixel_count": len(pixels),
                    "min_pixel_yx": (label // w, label % w),
                    "wkt": polygon_wkt(ext, holes),
                }
            )
    return sorted(comps, key=lambda c: c["label"])


# ---------------------------------------------------------------------------
# engine: run-based vectorized CCL (two-pass union-find over ROW RUNS —
# #runs << #pixels, so Python touches runs, never pixels)
# ---------------------------------------------------------------------------

def _row_runs(img: np.ndarray, include_zero: bool = False):
    """Row-major maximal equal-value runs.

    Returns (sy, sx, ex, rid): run k covers row sy[k], columns sx[k]..ex[k];
    rid maps every in-domain pixel to its run id (row-major cumsum — valid
    wherever the run mask is). include_zero=False skips value-0 pixels (the
    polygonize mask convention); True labels everything (sieve)."""
    h, w = img.shape
    dom = np.ones((h, w), dtype=bool) if include_zero else (img != 0)
    change = np.empty((h, w), dtype=bool)
    change[:, 0] = True
    change[:, 1:] = img[:, 1:] != img[:, :-1]
    if not include_zero:
        # a run also starts where the previous pixel was out of domain
        change[:, 1:] |= ~dom[:, :-1]
    rs = change & dom
    endm = np.empty((h, w), dtype=bool)
    endm[:, -1] = True
    endm[:, :-1] = img[:, :-1] != img[:, 1:]
    if not include_zero:
        endm[:, :-1] |= ~dom[:, 1:]
    sy, sx = np.nonzero(rs)
    _, ex = np.nonzero(endm & dom)
    rid = (np.cumsum(rs.ravel()).reshape(h, w) - 1).astype(np.int64)
    return sy.astype(np.int64), sx.astype(np.int64), ex.astype(np.int64), rid


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for counts ci (vectorized)."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    out -= np.repeat(np.cumsum(counts) - counts, counts)
    return out


def _run_merge_pairs(img, sy, sx, ex, connectivity: int):
    """(a, b) run-id pairs to union: overlapping runs of equal value in
    consecutive rows (4-conn: column overlap; 8-conn: overlap padded by 1).
    Vectorized per row pair with interval searchsorted — runs within a row
    are sorted by sx and disjoint, so each b-run's overlapping a-runs form a
    contiguous slice."""
    h = img.shape[0]
    pad = 1 if connectivity == 8 else 0
    row_ptr = np.searchsorted(sy, np.arange(h + 1))
    vals = img[sy, sx]
    pas, pbs = [], []
    for y in range(1, h):
        a0, a1 = int(row_ptr[y - 1]), int(row_ptr[y])
        b0, b1 = int(row_ptr[y]), int(row_ptr[y + 1])
        if a0 == a1 or b0 == b1:
            continue
        sxa, exa = sx[a0:a1], ex[a0:a1]
        sxb, exb = sx[b0:b1], ex[b0:b1]
        lo = np.searchsorted(exa, sxb - pad, side="left")
        hi = np.searchsorted(sxa, exb + pad, side="right")
        cnt = hi - lo
        m = cnt > 0
        if not m.any():
            continue
        cm = cnt[m]
        b_idx = np.repeat(np.arange(b0, b1, dtype=np.int64)[m], cm)
        a_idx = np.repeat(lo[m], cm) + _concat_ranges(cm) + a0
        same = vals[a_idx] == vals[b_idx]
        pas.append(a_idx[same])
        pbs.append(b_idx[same])
    if not pas:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(pas), np.concatenate(pbs)


def _union_roots(nruns: int, pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """Union-find over run ids; root = MIN run id of the component. Returns
    the fully-compressed root array. The only Python loop is over merge
    pairs (O(#pairs), tiny constants)."""
    parent = np.arange(nruns, dtype=np.int64)

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in zip(pa.tolist(), pb.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    # vectorized pointer jumping to full compression
    while True:
        p2 = parent[parent]
        if np.array_equal(p2, parent):
            return parent
        parent = p2


def _tile_ccl(tile: np.ndarray, connectivity: int) -> np.ndarray:
    """Labeling on one tile; labels = component min pixel index + 1
    (0 = background). Same contract as GDALRasterPolygonEnumerator's
    provisional pass, run-vectorized."""
    h, w = tile.shape
    sy, sx, ex, rid = _row_runs(tile, include_zero=False)
    lab = np.zeros((h, w), dtype=np.int64)
    if len(sy) == 0:
        return lab
    pa, pb = _run_merge_pairs(tile, sy, sx, ex, connectivity)
    roots = _union_roots(len(sy), pa, pb)
    # component anchor = min run-start pixel index; runs are scan-ordered so
    # the root run (min id) already starts at the component's min pixel
    start_idx = sy * w + sx
    lab_run = start_idx[roots] + 1
    nz = tile != 0
    lab[nz] = lab_run[rid[nz]]
    return lab


def polygonize(
    images: DataFrame,
    connectivity: int = 4,
    tile: int = 64,
    max_rounds: int = 16,
    trace_rings: bool = True,
) -> DataFrame:
    """Distributed polygonize over single-band images (fmt pgm/png gray).

    Returns (image_id, label, value, pixel_count, min_y, min_x[, wkt]).
    label = global min pixel index of the component (canonical). Results are
    tile-independent; ``tile`` only trades per-task array size against
    border-row volume (default 64 suits 256px+ rasters — a tiny tile on a
    big raster explodes border rows)."""
    spark = images.sparkSession

    def tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            frames = []
            for iid, buf, fmt in zip(
                b["image_id"].values, b["bytes"].values, b["fmt"].values
            ):
                img = codecs.decode(bytes(buf), fmt)
                if img.ndim == 3:
                    img = img[:, :, 0]
                H, W = img.shape
                for ty0 in range(0, H, tile):
                    for tx0 in range(0, W, tile):
                        sub = img[ty0 : ty0 + tile, tx0 : tx0 + tile]
                        lab = _tile_ccl(sub, connectivity)
                        th, tw = sub.shape
                        # runs of the LABEL image == value runs (horizontal
                        # same-value neighbors always share a label)
                        sy, sx, ex, _rid = _row_runs(lab, include_zero=False)
                        if len(sy) == 0:
                            continue
                        l0 = lab[sy, sx] - 1
                        g = (ty0 + l0 // tw) * W + (tx0 + l0 % tw)
                        vals = sub[sy, sx].astype(np.int64)
                        # border pixels: tile-edge pixels with a label
                        edge = np.zeros((th, tw), dtype=bool)
                        edge[0, :] = edge[-1, :] = True
                        edge[:, 0] = edge[:, -1] = True
                        bm = edge & (lab != 0)
                        by, bx = np.nonzero(bm)
                        bl = lab[by, bx] - 1
                        bg = (ty0 + bl // tw) * W + (tx0 + bl % tw)
                        bv = sub[by, bx].astype(np.int64)
                        nr, nb = len(sy), len(by)
                        frames.append(pd.DataFrame({
                            "kind": np.repeat(
                                np.array(["run", "border"]), [nr, nb]
                            ),
                            "image_id": np.repeat(iid, nr + nb),
                            "label": np.concatenate([g, bg]),
                            "gy": np.concatenate([ty0 + sy, ty0 + by]).astype(np.int32),
                            "gx0": np.concatenate([tx0 + sx, tx0 + bx]).astype(np.int32),
                            "gx1": np.concatenate([tx0 + ex, tx0 + bx]).astype(np.int32),
                            "value": np.concatenate([vals, bv]).astype(np.int32),
                            "img_w": np.concatenate(
                                [np.full(nr, W), np.zeros(nb)]
                            ).astype(np.int32),
                        }))
            if frames:
                yield pd.concat(frames, ignore_index=True)
            else:
                yield pd.DataFrame({
                    "kind": pd.Series([], dtype=object),
                    "image_id": pd.Series([], dtype=object),
                    "label": pd.Series([], dtype=np.int64),
                    "gy": pd.Series([], dtype=np.int32),
                    "gx0": pd.Series([], dtype=np.int32),
                    "gx1": pd.Series([], dtype=np.int32),
                    "value": pd.Series([], dtype=np.int32),
                    "img_w": pd.Series([], dtype=np.int32),
                })

    raw = images.select("image_id", "bytes", "fmt").mapInPandas(
        tiles,
        schema="kind string, image_id string, label long, gy int, gx0 int, "
               "gx1 int, value int, img_w int",
    ).localCheckpoint()

    runs = raw.filter(F.col("kind") == "run").drop("kind")
    border = raw.filter(F.col("kind") == "border").select(
        "image_id", "label", "gy", F.col("gx0").alias("gx"), "value"
    )

    # adjacency across tiles: neighbor offsets by connectivity
    offs = [(0, 1), (1, 0)]
    if connectivity == 8:
        offs += [(1, 1), (1, -1)]
    adj = None
    b2 = border.select(
        F.col("image_id").alias("image_id_b"), F.col("label").alias("label_b"),
        F.col("gy").alias("gy_b"), F.col("gx").alias("gx_b"),
        F.col("value").alias("value_b"),
    ).localCheckpoint()
    for dy, dx in offs:
        a = border.join(
            b2,
            (F.col("image_id_b") == F.col("image_id"))
            & (F.col("gy_b") == F.col("gy") + dy)
            & (F.col("gx_b") == F.col("gx") + dx)
            & (F.col("value_b") == F.col("value")),
        ).select("image_id", "label", "label_b")
        adj = a if adj is None else adj.unionByName(a)
    adj = (
        adj.filter(F.col("label") != F.col("label_b"))
        .select("image_id", "label", "label_b")
        .unionByName(
            adj.select("image_id", F.col("label_b").alias("label"),
                       F.col("label").alias("label_b"))
        )
        .distinct()
        .localCheckpoint()
    )

    # min-label propagation fixpoint
    mapping = (
        runs.select("image_id", "label").distinct()
        .withColumn("final", F.col("label"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        prop = (
            adj.join(
                mapping.select(
                    F.col("image_id"), F.col("label").alias("label_b"),
                    F.col("final").alias("final_b"),
                ),
                ["image_id", "label_b"],
            )
            .groupBy("image_id", "label")
            .agg(F.min("final_b").alias("nbr_min"))
        )
        new_mapping = (
            mapping.join(prop, ["image_id", "label"], "left")
            .withColumn("final2", F.least(F.col("final"), F.coalesce("nbr_min", "final")))
            .select("image_id", "label", F.col("final2").alias("final"))
            .localCheckpoint()
        )
        changed = (
            new_mapping.join(mapping.withColumnRenamed("final", "old"),
                             ["image_id", "label"])
            .filter(F.col("final") != F.col("old"))
            .count()
        )
        mapping = new_mapping
        if changed == 0:
            break
        # propagate transitively: label's final may itself map lower
        mapping = (
            mapping.alias("m")
            .join(
                mapping.select(
                    F.col("image_id"), F.col("label").alias("final"),
                    F.col("final").alias("final_of_final"),
                ).alias("f"),
                ["image_id", "final"], "left",
            )
            .select(
                "image_id", "label",
                F.least(F.col("final"), F.coalesce("final_of_final", "final")).alias("final"),
            )
            .localCheckpoint()
        )

    fruns = runs.join(mapping, ["image_id", "label"]).select(
        "image_id", F.col("final").alias("label"), "gy", "gx0", "gx1", "value", "img_w"
    )

    stats = fruns.groupBy("image_id", "label").agg(
        F.first("value").alias("value"),
        F.sum(F.col("gx1") - F.col("gx0") + 1).alias("pixel_count"),
        F.first("img_w").alias("img_w"),
    ).select(
        "image_id", "label", "value", "pixel_count",
        F.floor(F.col("label") / F.col("img_w")).cast("int").alias("min_y"),
        F.pmod(F.col("label"), F.col("img_w")).cast("int").alias("min_x"),
    )
    if not trace_rings:
        return stats

    def trace(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gy = pdf["gy"].to_numpy(np.int64)
        ga = pdf["gx0"].to_numpy(np.int64)
        gb = pdf["gx1"].to_numpy(np.int64)
        y0, x0 = int(gy.min()), int(ga.min())
        mask = np.zeros((int(gy.max()) - y0 + 1, int(gb.max()) - x0 + 1), dtype=bool)
        for y, a, bb in zip((gy - y0).tolist(), (ga - x0).tolist(), (gb - x0).tolist()):
            mask[y, a : bb + 1] = True
        wkt = polygon_wkt(*boundary_rings(mask, oy=y0, ox=x0))
        return pd.DataFrame([(key[0], int(key[1]), wkt)],
                            columns=["image_id", "label", "wkt"])

    rings = fruns.groupBy("image_id", "label").applyInPandas(
        trace, schema="image_id string, label long, wkt string"
    )
    return stats.join(rings, ["image_id", "label"])


# ---------------------------------------------------------------------------
# R7 — sieve (alg/sieve.cpp : GDALSieveFilter ≈L300)
# ---------------------------------------------------------------------------

def _label_all(img: np.ndarray, connectivity: int):
    """Dense component labeling over ALL pixels (value 0 included — GDAL
    sieves the background polygon too). Returns (lab, sizes, vals) with
    component ids dense in first-pixel scan order — the same order a
    sequential BFS scan assigns, so tie-breaks match the oracle exactly."""
    sy, sx, ex, rid = _row_runs(img, include_zero=True)
    pa, pb = _run_merge_pairs(img, sy, sx, ex, connectivity)
    roots = _union_roots(len(sy), pa, pb)
    uniq, comp_of_run = np.unique(roots, return_inverse=True)
    sizes = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sizes, comp_of_run, ex - sx + 1)
    vals = img[sy[uniq], sx[uniq]]
    return comp_of_run[rid], sizes, vals


def np_sieve_fast(img: np.ndarray, threshold: int, connectivity: int = 4,
                  max_rounds: int = 100) -> np.ndarray:
    """Vectorized GDALSieveFilter: run-based CCL + vectorized neighbor-argmax
    merge per round. Bit-identical to the BFS oracle ``np_sieve`` (pinned by
    tests) — component ordering, merge-target tie-breaks ((size, -id) max)
    and the 4-neighbor replacement search all match."""
    out = img.copy()
    for _ in range(max_rounds):
        lab, sizes, vals = _label_all(out, connectivity)
        ncomp = len(sizes)
        small = sizes < threshold
        if not small.any():
            return out
        # unique directed adjacency (4-neighbor replacement search, as GDAL)
        ha, hb = lab[:, :-1], lab[:, 1:]
        va, vb = lab[:-1, :], lab[1:, :]
        hd, vd = ha != hb, va != vb
        c = np.concatenate([ha[hd], hb[hd], va[vd], vb[vd]])
        n2 = np.concatenate([hb[hd], ha[hd], vb[vd], va[vd]])
        key = np.unique(c * ncomp + n2)
        pc, pn = key // ncomp, key % ncomp
        m = small[pc]
        pc, pn = pc[m], pn[m]
        if len(pc) == 0:
            return out
        # per small component: neighbor maximizing (size, -id) — sort by
        # (pc, size asc, id desc) and take the last row of each pc group
        order = np.lexsort((-pn, sizes[pn], pc))
        pc_o, pn_o = pc[order], pn[order]
        last = np.nonzero(np.append(pc_o[1:] != pc_o[:-1], True))[0]
        tgt_c, tgt_n = pc_o[last], pn_o[last]
        diff = vals[tgt_n] != vals[tgt_c]
        if not diff.any():
            return out
        newval = vals.copy()
        newval[tgt_c[diff]] = vals[tgt_n[diff]]
        out = newval[lab]
    return out


def np_sieve(img: np.ndarray, threshold: int, connectivity: int = 4,
             max_rounds: int = 100) -> np.ndarray:
    """Remove components smaller than `threshold` pixels by merging each
    into its largest neighbor component, iterating to a fixpoint — the
    GDALSieveFilter contract. Components are equal-value regions INCLUDING
    value 0 (GDAL sieves the background polygon too).

    This is the sequential BFS ORACLE (per-pixel Python — test-only); the
    engine path uses the vectorized ``np_sieve_fast``."""
    out = img.copy()
    if connectivity == 4:
        nbrs = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    else:
        nbrs = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    h, w = out.shape
    for _ in range(max_rounds):
        # label components (BFS)
        lab = np.full((h, w), -1, dtype=np.int64)
        sizes: list[int] = []
        vals: list[int] = []
        for y0 in range(h):
            for x0 in range(w):
                if lab[y0, x0] >= 0:
                    continue
                cid = len(sizes)
                v = out[y0, x0]
                stack = [(y0, x0)]
                lab[y0, x0] = cid
                cnt = 0
                while stack:
                    y, x = stack.pop()
                    cnt += 1
                    for dy, dx in nbrs:
                        ny, nx = y + dy, x + dx
                        if 0 <= ny < h and 0 <= nx < w and lab[ny, nx] < 0 and out[ny, nx] == v:
                            lab[ny, nx] = cid
                            stack.append((ny, nx))
                sizes.append(cnt)
                vals.append(int(v))
        sizes_a = np.array(sizes)
        small = np.nonzero(sizes_a < threshold)[0]
        if len(small) == 0:
            return out
        # 4-adjacency between components (edge scan; diagonal merge targets
        # follow GDAL, which uses 4-neighbors for the replacement search)
        adj: dict[int, set[int]] = {}
        for (a, b) in ((lab[:, :-1], lab[:, 1:]), (lab[:-1, :], lab[1:, :])):
            diff = a != b
            for ca, cb in zip(a[diff].ravel(), b[diff].ravel()):
                adj.setdefault(int(ca), set()).add(int(cb))
                adj.setdefault(int(cb), set()).add(int(ca))
        changed = False
        # merge smallest-first for determinism
        for cid in sorted(small, key=lambda c: (sizes_a[c], c)):
            nbrs_c = adj.get(int(cid), set())
            if not nbrs_c:
                continue
            tgt = max(nbrs_c, key=lambda c: (sizes_a[c], -c))
            if vals[tgt] != vals[cid]:
                out[lab == cid] = vals[tgt]
                changed = True
        if not changed:
            return out
    return out


def sieve(images: DataFrame, threshold: int, connectivity: int = 4,
          out_fmt: str = "pgm") -> DataFrame:
    """Distributed sieve over single-band images (one Arrow pass per batch;
    each image row is its own raster in this engine's data model)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, buf, fmt in zip(
                b["image_id"].values, b["bytes"].values, b["fmt"].values
            ):
                img = codecs.decode(bytes(buf), fmt)
                if img.ndim == 3:
                    img = img[:, :, 0]
                out = np_sieve_fast(img, threshold, connectivity)
                rows.append((iid, codecs.encode(out, out_fmt), out_fmt,
                             out.shape[1], out.shape[0],
                             codecs.gdal_style_checksum(out)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["image_id", "bytes", "fmt", "w", "h", "checksum"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run,
        schema="image_id string, bytes binary, fmt string, w int, h int, checksum int",
    )

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

Divergence note: GDAL emits holes (donut components produce interior rings);
this round traces the exterior ring only (holes = tier 2, recorded here).

The sequential oracle (np_polygonize) uses BFS flood fill — a different
algorithm — sharing only the ring-extraction geometry helper.
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

def exterior_ring(mask: np.ndarray, oy: int = 0, ox: int = 0) -> list[tuple[int, int]]:
    """Exterior pixel-edge ring of a connected True-mask, offset to global
    coords. Directed edges with interior on the left (y-down), stitched into
    loops; the loop with max |area| is the exterior. Canonical form: starts
    at the lexicographically smallest vertex, first step toward the smaller
    neighbor."""
    h, w = mask.shape
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(a, b):
        edges.setdefault(a, []).append(b)

    ys, xs = np.nonzero(mask)
    for y, x in zip(ys.tolist(), xs.tolist()):
        if y == 0 or not mask[y - 1, x]:
            add((x, y), (x + 1, y))          # top edge, left->right
        if y == h - 1 or not mask[y + 1, x]:
            add((x + 1, y + 1), (x, y + 1))  # bottom edge, right->left
        if x == 0 or not mask[y, x - 1]:
            add((x, y + 1), (x, y))          # left edge, bottom->top
        if x == w - 1 or not mask[y, x + 1]:
            add((x + 1, y), (x + 1, y + 1))  # right edge, top->bottom

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

    def area(lp):
        a = 0
        for i in range(len(lp)):
            x1, y1 = lp[i]
            x2, y2 = lp[(i + 1) % len(lp)]
            a += x1 * y2 - x2 * y1
        return abs(a) / 2.0

    ring = max(loops, key=area)
    # simplify collinear runs
    out = []
    n = len(ring)
    for i in range(n):
        p0, p1, p2 = ring[i - 1], ring[i], ring[(i + 1) % n]
        if (p1[0] - p0[0]) * (p2[1] - p1[1]) != (p1[1] - p0[1]) * (p2[0] - p1[0]):
            out.append(p1)
    # canonical start + direction
    s = min(range(len(out)), key=lambda i: out[i])
    out = out[s:] + out[:s]
    if len(out) > 2 and out[-1] < out[1]:
        out = [out[0]] + out[1:][::-1]
    return [(x + ox, y + oy) for x, y in out]


def ring_to_wkt(ring: list[tuple[int, int]]) -> str:
    pts = ring + [ring[0]]
    return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in pts) + "))"


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
            comps.append(
                {
                    "label": label,
                    "value": int(v),
                    "pixel_count": len(pixels),
                    "min_pixel_yx": (label // w, label % w),
                    "wkt": ring_to_wkt(exterior_ring(mask)),
                }
            )
    return sorted(comps, key=lambda c: c["label"])


# ---------------------------------------------------------------------------
# engine: per-tile union-find CCL
# ---------------------------------------------------------------------------

def _tile_ccl(tile: np.ndarray, connectivity: int) -> np.ndarray:
    """Two-pass union-find labeling on one tile; labels = local min pixel
    index + 1 (0 = background). Mirrors GDALRasterPolygonEnumerator."""
    h, w = tile.shape
    lab = np.zeros((h, w), dtype=np.int64)
    parent: dict[int, int] = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb

    for y in range(h):
        for x in range(w):
            v = tile[y, x]
            if v == 0:
                continue
            cands = []
            if x > 0 and tile[y, x - 1] == v:
                cands.append(lab[y, x - 1])
            if y > 0 and tile[y - 1, x] == v:
                cands.append(lab[y - 1, x])
            if connectivity == 8 and y > 0:
                if x > 0 and tile[y - 1, x - 1] == v:
                    cands.append(lab[y - 1, x - 1])
                if x < w - 1 and tile[y - 1, x + 1] == v:
                    cands.append(lab[y - 1, x + 1])
            if not cands:
                new = y * w + x + 1
                parent[new] = new
                lab[y, x] = new
            else:
                m = min(cands)
                lab[y, x] = m
                for c in cands:
                    union(m, c)
    # second pass: resolve to root, re-anchor to true min pixel index
    roots: dict[int, int] = {}
    for y in range(h):
        for x in range(w):
            if lab[y, x]:
                r = find(lab[y, x])
                roots.setdefault(r, y * w + x + 1)  # first scan hit = min idx
                lab[y, x] = roots[r]
    return lab


def polygonize(
    images: DataFrame,
    connectivity: int = 4,
    tile: int = 10,
    max_rounds: int = 16,
    trace_rings: bool = True,
) -> DataFrame:
    """Distributed polygonize over single-band images (fmt pgm/png gray).

    Returns (image_id, label, value, pixel_count, min_y, min_x[, wkt]).
    label = global min pixel index of the component (canonical)."""
    spark = images.sparkSession

    def tiles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            runs, borders = [], []
            for _, r in b.iterrows():
                img = codecs.decode(bytes(r["bytes"]), r["fmt"])
                if img.ndim == 3:
                    img = img[:, :, 0]
                H, W = img.shape
                for ty0 in range(0, H, tile):
                    for tx0 in range(0, W, tile):
                        sub = img[ty0 : ty0 + tile, tx0 : tx0 + tile]
                        lab = _tile_ccl(sub, connectivity)
                        th, tw = sub.shape
                        for y in range(th):
                            x = 0
                            while x < tw:
                                if lab[y, x] == 0:
                                    x += 1
                                    continue
                                l0 = lab[y, x]
                                x1 = x
                                while x1 + 1 < tw and lab[y, x1 + 1] == l0:
                                    x1 += 1
                                # global provisional label: min global pixel
                                # index of the local component
                                ly, lx = (l0 - 1) // tw, (l0 - 1) % tw
                                g = (ty0 + ly) * W + (tx0 + lx)
                                runs.append(
                                    (r["image_id"], int(g), ty0 + y, tx0 + x,
                                     tx0 + x1, int(sub[y, x]), W)
                                )
                                # border pixels of this run
                                for bx in range(x, x1 + 1):
                                    on_edge = (
                                        y == 0 or y == th - 1
                                        or bx == 0 or bx == tw - 1
                                    )
                                    if on_edge:
                                        borders.append(
                                            (r["image_id"], int(g),
                                             ty0 + y, tx0 + bx, int(sub[y, x]))
                                        )
                                x = x1 + 1
            yield pd.DataFrame(
                {
                    "kind": ["run"] * len(runs) + ["border"] * len(borders),
                    "image_id": [t[0] for t in runs] + [t[0] for t in borders],
                    "label": [t[1] for t in runs] + [t[1] for t in borders],
                    "gy": [t[2] for t in runs] + [t[2] for t in borders],
                    "gx0": [t[3] for t in runs] + [t[3] for t in borders],
                    "gx1": [t[4] for t in runs] + [t[3] for t in borders],
                    "value": [t[5] for t in runs] + [t[4] for t in borders],
                    "img_w": [t[6] for t in runs] + [0] * len(borders),
                }
            )

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
        y0, y1 = int(pdf["gy"].min()), int(pdf["gy"].max())
        x0, x1 = int(pdf["gx0"].min()), int(pdf["gx1"].max())
        mask = np.zeros((y1 - y0 + 1, x1 - x0 + 1), dtype=bool)
        for _, r in pdf.iterrows():
            mask[r["gy"] - y0, r["gx0"] - x0 : r["gx1"] - x0 + 1] = True
        wkt = ring_to_wkt(exterior_ring(mask, oy=y0, ox=x0))
        return pd.DataFrame([(key[0], int(key[1]), wkt)],
                            columns=["image_id", "label", "wkt"])

    rings = fruns.groupBy("image_id", "label").applyInPandas(
        trace, schema="image_id string, label long, wkt string"
    )
    return stats.join(rings, ["image_id", "label"])


# ---------------------------------------------------------------------------
# R7 — sieve (alg/sieve.cpp : GDALSieveFilter ≈L300)
# ---------------------------------------------------------------------------

def np_sieve(img: np.ndarray, threshold: int, connectivity: int = 4,
             max_rounds: int = 100) -> np.ndarray:
    """Remove components smaller than `threshold` pixels by merging each
    into its largest neighbor component, iterating to a fixpoint — the
    GDALSieveFilter contract. Components are equal-value regions INCLUDING
    value 0 (GDAL sieves the background polygon too)."""
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
            for _, r in b.iterrows():
                img = codecs.decode(bytes(r["bytes"]), r["fmt"])
                if img.ndim == 3:
                    img = img[:, :, 0]
                out = np_sieve(img, threshold, connectivity)
                rows.append((r["image_id"], codecs.encode(out, out_fmt), out_fmt,
                             out.shape[1], out.shape[0],
                             codecs.gdal_style_checksum(out)))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["image_id", "bytes", "fmt", "w", "h", "checksum"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run,
        schema="image_id string, bytes binary, fmt string, w int, h int, checksum int",
    )

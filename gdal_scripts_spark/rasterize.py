"""Rasterize — vector → raster burn (SURVEY.md §2.9 R2).

Reference semantics: ``alg/gdalrasterize.cpp : GDALRasterizeGeometries
(≈L700), gv_rasterize_one_shape (≈L400)`` with the even-odd scanline fill of
``alg/llrasterize.cpp : GDALdllImageFilledPolygon (≈L60)``; ALL_TOUCHED=false
(pixel center decides), MERGE_ALG replace|add.

Spark-first plan: polygons → covering (z, tx, ty) tiles via the bbox cover
(the same conservative pretest as the spatial join) exploded into a
DataFrame; one Arrow pass fills each (polygon, tile) fragment with a
vectorized even-odd test of the 256x256 pixel-center grid (the engine path);
a grouped overlay merges fragments per tile (replace = last poly wins in
poly_id order, add = sum of hits — gdal_rasterize MERGE_ALG). The sequential
oracle uses a true scanline edge-intersection fill (different algorithm)
for independence.

Pixel-center convention: tile pixel (i, j) covers mercator
[txmin + i*res, txmin+(i+1)*res] x [tymax-(j+1)*res, tymax-j*res]; its center
is tested against the polygon in lon/lat space (polygons are stored in
degrees). ALL_TOUCHED=false exactly as the reference default.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells, geom, joins

TILE = 256


def _tile_pixel_lonlat(tx: int, ty: int, z: int):
    """(lon[i], lat[j]) of the 256x256 pixel centers of a TMS tile."""
    res = cells.resolution(z)
    txmin = tx * TILE * res - cells.ORIGIN_SHIFT
    tymax = (ty + 1) * TILE * res - cells.ORIGIN_SHIFT
    mx = txmin + (np.arange(TILE) + 0.5) * res
    my = tymax - (np.arange(TILE) + 0.5) * res
    lon, _ = cells.np_meters_to_lonlat(mx, np.zeros_like(mx))
    _, lat = cells.np_meters_to_lonlat(np.zeros_like(my), my)
    return lon, lat


def rasterize_counts(
    polygons_pack: geom.PolygonPack, spark, z: int = 8
) -> DataFrame:
    """(poly_id, z, tx, ty, y_xyz, burned) — burned-pixel count per covering
    tile, even-odd, ALL_TOUCHED=false (FIXTURES.md golden/rasterize.json)."""
    cover = spark.createDataFrame(
        joins.polygon_cover_cells(polygons_pack, z), schema="poly_id long, cell long"
    )
    bc = spark.sparkContext.broadcast(polygons_pack)

    def burn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pk = bc.value
        pos = {int(p): i for i, p in enumerate(pk.poly_ids)}
        n = 1 << z
        for b in batches:
            rows = []
            for cell_v, poly_v in zip(b["cell"].values, b["poly_id"].values):
                _, tx, ty_xyz = (int(v) for v in cells.np_cell_to_tile(int(cell_v)))
                ty = n - 1 - ty_xyz
                lon, lat = _tile_pixel_lonlat(tx, ty, z)
                rings = pk.rings_of(pos[int(poly_v)])
                # vectorized even-odd over the grid: evaluate per row j
                glon = np.repeat(lon[None, :], TILE, axis=0).ravel()
                glat = np.repeat(lat[:, None], TILE, axis=1).ravel()
                hit = geom.pip_even_odd(glon, glat, rings)
                burned = int(hit.sum())
                if burned:
                    rows.append((int(poly_v), z, tx, ty, ty_xyz, burned))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["poly_id", "z", "tx", "ty", "y_xyz", "burned"]
                )

    return cover.mapInPandas(
        burn, schema="poly_id long, z int, tx long, ty long, y_xyz long, burned long"
    )


def rasterize_tiles(
    polygons_pack: geom.PolygonPack,
    spark,
    z: int = 8,
    burn_attr: dict[int, int] | None = None,
    merge_alg: str = "replace",
) -> DataFrame:
    """(z, tx, ty, y_xyz, tile_bytes raw int32 256*256) — full burned tiles.

    merge_alg 'replace': higher poly_id wins on overlap (deterministic input
    order, like gdal_rasterize's geometry order); 'add': values sum
    (MERGE_ALG=ADD)."""
    if merge_alg not in ("replace", "add"):
        raise ValueError(merge_alg)
    cover = spark.createDataFrame(
        joins.polygon_cover_cells(polygons_pack, z), schema="poly_id long, cell long"
    )
    bc = spark.sparkContext.broadcast(polygons_pack)
    burn_map = burn_attr or {}

    def frag(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pk = bc.value
        pos = {int(p): i for i, p in enumerate(pk.poly_ids)}
        n = 1 << z
        for b in batches:
            rows = []
            for cell_v, poly_v in zip(b["cell"].values, b["poly_id"].values):
                _, tx, ty_xyz = (int(v) for v in cells.np_cell_to_tile(int(cell_v)))
                ty = n - 1 - ty_xyz
                lon, lat = _tile_pixel_lonlat(tx, ty, z)
                pid = int(poly_v)
                rings = pk.rings_of(pos[pid])
                glon = np.repeat(lon[None, :], TILE, axis=0).ravel()
                glat = np.repeat(lat[:, None], TILE, axis=1).ravel()
                hit = geom.pip_even_odd(glon, glat, rings).reshape(TILE, TILE)
                if hit.any():
                    rows.append((pid, tx, ty, ty_xyz, np.packbits(hit).tobytes()))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["poly_id", "tx", "ty", "y_xyz", "mask"]
                )

    frags = cover.mapInPandas(
        frag, schema="poly_id long, tx long, ty long, y_xyz long, mask binary"
    )

    def overlay(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        canvas = np.zeros((TILE, TILE), dtype=np.int32)
        srt = pdf.sort_values("poly_id")
        for mask_v, poly_v in zip(srt["mask"].values, srt["poly_id"].values):
            m = np.unpackbits(np.frombuffer(mask_v, np.uint8))[: TILE * TILE]
            m = m.reshape(TILE, TILE).astype(bool)
            v = int(burn_map.get(int(poly_v), poly_v))
            if merge_alg == "add":
                canvas[m] += v
            else:
                canvas[m] = v
        return pd.DataFrame(
            [(z, tx, ty, (1 << z) - 1 - ty, canvas.tobytes())],
            columns=["z", "tx", "ty", "y_xyz", "tile_bytes"],
        )

    return frags.groupBy("tx", "ty").applyInPandas(
        overlay, schema="z int, tx long, ty long, y_xyz long, tile_bytes binary"
    )


# ---------------------------------------------------------------------------
# sequential oracle — true scanline edge-intersection fill (independent)
# ---------------------------------------------------------------------------

def np_rasterize_counts(pack: geom.PolygonPack, z: int) -> list[tuple[int, int, int, int]]:
    """(poly_id, tx, ty, burned) by scanline fill — for every covering tile."""
    out = []
    n = 1 << z
    for p in range(pack.n_polys):
        x0, y0, x1, y1 = pack.bbox[p]
        txa, tya = cells.np_lonlat_to_tile_tms(np.array([x0]), np.array([y0]), z)
        txb, tyb = cells.np_lonlat_to_tile_tms(np.array([x1]), np.array([y1]), z)
        rings = pack.rings_of(p)
        for tx in range(max(int(txa[0]), 0), min(int(txb[0]), n - 1) + 1):
            for ty in range(max(int(tya[0]), 0), min(int(tyb[0]), n - 1) + 1):
                lon, lat = _tile_pixel_lonlat(tx, ty, z)
                burned = 0
                for j in range(TILE):
                    yv = lat[j]
                    # gather x-intersections of all ring edges with y=yv
                    xs = []
                    for ring in rings:
                        r = np.asarray(ring)
                        a = r
                        bb = np.roll(r, -1, axis=0)
                        for (ax, ay), (bx, by) in zip(a, bb):
                            if (ay > yv) != (by > yv):
                                xs.append(ax + (yv - ay) * (bx - ax) / (by - ay))
                    if not xs:
                        continue
                    xs.sort()
                    # fill between pairs
                    for i in range(0, len(xs) - 1, 2):
                        lo, hi = xs[i], xs[i + 1]
                        burned += int(np.count_nonzero((lon > lo) & (lon < hi)))
                if burned:
                    out.append((int(pack.poly_ids[p]), tx, ty, burned))
    return out

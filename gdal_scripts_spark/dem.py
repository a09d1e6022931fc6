"""Focal 3x3 terrain operators — gdaldem (SURVEY.md §2.5 W1).

Reference semantics: ``apps/gdaldem_lib.cpp : GDALHillshadeAlg (≈L700),
GDALSlopeHornAlg (≈L1100), GDALAspectAlg, GDALTRIAlg, GDALTPIAlg,
GDALRoughnessAlg`` — 3x3 pixel-window kernels over a single-band DEM.

Spark-first: each image row IS the raster (the engine's data model), so the
focal window never crosses a row boundary — one vectorized numpy stencil per
image inside an Arrow batch, zero shuffle, embarrassingly parallel at 10^12
images. (For a single continental DEM split into tiles, the halo exchange is
a (z, x±1, y±1) self-join to fetch 1-px edges — noted as the tier-2 path in
SURVEY.md W1; the per-image case is what the input table shape calls for.)

Kernels (Horn formulation, matching the GDAL defaults):
  dz/dx = ((c + 2f + i) - (a + 2d + g)) / (8 * xres)
  dz/dy = ((g + 2h + i) - (a + 2b + c)) / (8 * yres)
  slope = atan(z_factor * hypot(dzdx, dzdy))
  hillshade = 255 * (cos(zen)cos(slope) + sin(zen)sin(slope)cos(az - aspect))
Edge pixels use edge-replication (GDAL computes only interior unless
-compute_edges; we mirror -compute_edges=YES with replicated edges, pinned
by our goldens).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codecs


def _pad(a: np.ndarray) -> np.ndarray:
    return np.pad(a, 1, mode="edge")


def _derivatives(z: np.ndarray, xres: float, yres: float, zf: float):
    p = _pad(z.astype(np.float64))
    a, b, c = p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:]
    d, f = p[1:-1, :-2], p[1:-1, 2:]
    g, h, i = p[2:, :-2], p[2:, 1:-1], p[2:, 2:]
    dzdx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * xres)
    dzdy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * yres)
    return zf * dzdx, zf * dzdy, (a, b, c, d, f, g, h, i)


def np_hillshade(z, xres=1.0, yres=1.0, z_factor=1.0, azimuth=315.0, altitude=45.0):
    dzdx, dzdy, _ = _derivatives(z, xres, yres, z_factor)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    aspect = np.arctan2(dzdy, -dzdx)
    az = math.radians(360.0 - azimuth + 90.0)
    zen = math.radians(90.0 - altitude)
    shade = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(
        az - aspect
    )
    return np.clip(np.rint(254.0 * np.maximum(shade, 0) + 1), 1, 255).astype(np.uint8)


def np_slope_deg(z, xres=1.0, yres=1.0):
    dzdx, dzdy, _ = _derivatives(z, xres, yres, 1.0)
    return np.degrees(np.arctan(np.hypot(dzdx, dzdy)))


def np_aspect_deg(z, xres=1.0, yres=1.0):
    dzdx, dzdy, _ = _derivatives(z, xres, yres, 1.0)
    asp = np.degrees(np.arctan2(dzdy, -dzdx))
    asp = np.where(asp < 0, 90.0 - asp, np.where(asp > 90.0, 360.0 - asp + 90.0, 90.0 - asp))
    return asp


def np_tri(z):
    p = _pad(z.astype(np.float64))
    c = p[1:-1, 1:-1]
    s = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            s += np.abs(p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx] - c)
    return s / 8.0


def np_tpi(z):
    p = _pad(z.astype(np.float64))
    c = p[1:-1, 1:-1]
    s = np.zeros_like(c)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == dx == 0:
                continue
            s += p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
    return c - s / 8.0


def np_roughness(z):
    p = _pad(z.astype(np.float64))
    stack = [
        p[1 + dy : p.shape[0] - 1 + dy, 1 + dx : p.shape[1] - 1 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    ]
    arr = np.stack(stack)
    return arr.max(axis=0) - arr.min(axis=0)


_MODES = {
    "hillshade": lambda z, kw: np_hillshade(z, **kw),
    "slope": lambda z, kw: np.clip(np.rint(np_slope_deg(z, kw.get("xres", 1.0), kw.get("yres", 1.0))), 0, 255).astype(np.uint8),
    "aspect": lambda z, kw: np.clip(np.rint(np_aspect_deg(z, kw.get("xres", 1.0), kw.get("yres", 1.0)) / 2.0), 0, 255).astype(np.uint8),
    "tri": lambda z, kw: np.clip(np.rint(np_tri(z)), 0, 255).astype(np.uint8),
    "tpi": lambda z, kw: np.clip(np.rint(np_tpi(z) + 128.0), 0, 255).astype(np.uint8),
    "roughness": lambda z, kw: np.clip(np.rint(np_roughness(z)), 0, 255).astype(np.uint8),
}


def gdaldem(images: DataFrame, mode: str = "hillshade", out_fmt: str = "pgm",
            **kwargs) -> DataFrame:
    """gdaldem over the images table: band 0 is the DEM; returns re-encoded
    single-band rasters (image_id, bytes, fmt, w, h, checksum)."""
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}")
    fn = _MODES[mode]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, byts, fmt in zip(
                b["image_id"].values, b["bytes"].values, b["fmt"].values
            ):
                img = codecs.decode(bytes(byts), fmt)
                z = img[:, :, 0] if img.ndim == 3 else img
                out = fn(z, kwargs)
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

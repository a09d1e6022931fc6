"""gdaldem focal kernels vs scalar references; rgb2pct quantization quality
and pct2rgb roundtrip."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from gdal_scripts_spark import codecs, dem, fixtures, palette


def _dem_df(spark, z):
    pdf = pd.DataFrame([{
        "image_id": "dem0", "bytes": codecs.encode(z.astype(np.uint8), "pgm"),
        "w": z.shape[1], "h": z.shape[0], "fmt": "pgm", "caption": "d",
        "phash": 0, "lon": 0.0, "lat": 0.0,
    }])
    return spark.createDataFrame(pdf, schema=fixtures.IMAGES_SCHEMA)


def _scalar_hillshade(z, az=315.0, alt=45.0):
    """Independent scalar-loop Horn hillshade."""
    h, w = z.shape
    p = np.pad(z.astype(float), 1, mode="edge")
    out = np.zeros((h, w))
    azr = math.radians(360.0 - az + 90.0)
    zen = math.radians(90.0 - alt)
    for y in range(h):
        for x in range(w):
            win = p[y : y + 3, x : x + 3]
            dzdx = ((win[0, 2] + 2 * win[1, 2] + win[2, 2])
                    - (win[0, 0] + 2 * win[1, 0] + win[2, 0])) / 8.0
            dzdy = ((win[2, 0] + 2 * win[2, 1] + win[2, 2])
                    - (win[0, 0] + 2 * win[0, 1] + win[0, 2])) / 8.0
            slope = math.atan(math.hypot(dzdx, dzdy))
            aspect = math.atan2(dzdy, -dzdx)
            v = math.cos(zen) * math.cos(slope) + math.sin(zen) * math.sin(
                slope) * math.cos(azr - aspect)
            out[y, x] = min(max(round(254.0 * max(v, 0) + 1), 1), 255)
    return out.astype(np.uint8)


def test_hillshade_matches_scalar_reference(spark):
    rng = np.random.default_rng(3)
    z = rng.integers(0, 200, (12, 15)).astype(np.uint8)
    df = _dem_df(spark, z)
    row = dem.gdaldem(df, "hillshade").collect()[0]
    got = codecs.decode(bytes(row["bytes"]), "pgm")
    assert np.array_equal(got, _scalar_hillshade(z))


@pytest.mark.parametrize("mode", ["slope", "aspect", "tri", "tpi", "roughness"])
def test_dem_modes_run_and_flat_dem_is_trivial(spark, mode):
    flat = np.full((10, 10), 77, np.uint8)
    df = _dem_df(spark, flat)
    row = dem.gdaldem(df, mode).collect()[0]
    out = codecs.decode(bytes(row["bytes"]), "pgm")
    assert out.shape == (10, 10)
    if mode in ("slope", "tri", "roughness"):
        assert (out == 0).all()  # flat terrain
    if mode == "tpi":
        assert (out == 128).all()  # offset-encoded zero


def test_dem_known_ramp_slope():
    # plane z = 4x: dzdx=4 -> slope = atan(4) = 75.96 deg everywhere
    ys, xs = np.mgrid[0:8, 0:8]
    z = (4 * xs).astype(float)
    s = dem.np_slope_deg(z)
    assert np.allclose(s[:, 1:-1], math.degrees(math.atan(4)), atol=1e-9)


def test_rgb2pct_roundtrip_quality(spark):
    images = fixtures.images_spark(spark, n=6)
    indexed, pal = palette.rgb2pct(images, n_colors=64)
    assert pal.shape[1] == 3 and 2 <= len(pal) <= 64
    back = palette.pct2rgb(indexed, pal)
    rows = {r["image_id"]: r for r in back.collect()}
    pdf = fixtures.make_images_pdf(6)
    errs = []
    for _, r in pdf.iterrows():
        orig = codecs.decode(r["bytes"], r["fmt"])
        rec = codecs.decode(bytes(rows[r["image_id"]]["bytes"]), "ppm")
        errs.append(np.abs(orig.astype(float) - rec.astype(float)).mean())
    # 64-color palette on gradient-ish images: mean error well under 32
    assert np.mean(errs) < 32.0, errs


def test_median_cut_exact_when_few_colors():
    # histogram with exactly 3 colors -> palette must contain all 3 centers
    hist = [((10 << 10) | (5 << 5) | 1, 100), ((2 << 10) | (20 << 5) | 7, 50),
            ((31 << 10) | (0 << 5) | 31, 25)]
    pal = palette.median_cut(hist, n_colors=8)
    assert len(pal) == 3
    expected = {(10 * 8 + 4, 5 * 8 + 4, 1 * 8 + 4), (2 * 8 + 4, 20 * 8 + 4, 7 * 8 + 4),
                (31 * 8 + 4, 0 * 8 + 4, 31 * 8 + 4)}
    assert {tuple(int(v) for v in c) for c in pal} == expected


def test_gdaldem_tiled_halo_exact(spark):
    """Tiled focal op with halo exchange == whole-image op, every mode,
    including tile seams and ragged mosaic borders."""
    import numpy as np
    import pandas as pd
    from gdal_scripts_spark import codecs, dem, fixtures, raster

    rng = np.random.default_rng(12)
    img = rng.integers(0, 255, (25, 33)).astype(np.uint8)
    pdf = pd.DataFrame([{"image_id": "d", "bytes": codecs.encode(img, "pgm"),
                         "w": 33, "h": 25, "fmt": "pgm", "caption": "x",
                         "phash": 0, "lon": 0.0, "lat": 0.0}])
    df = spark.createDataFrame(pdf, schema=fixtures.IMAGES_SCHEMA)
    tiles = raster.retile(df, tile_w=10, tile_h=10, pad=False)
    for mode in ["hillshade", "slope", "aspect", "tri", "tpi", "roughness"]:
        rows = dem.gdaldem_tiled(tiles, mode).collect()
        got = np.zeros_like(img)
        for r in rows:
            a = np.frombuffer(bytes(r["tile_bytes"]), np.uint8).reshape(
                r["th"], r["tw"])
            got[r["tile_row"] * 10 : r["tile_row"] * 10 + r["th"],
                r["tile_col"] * 10 : r["tile_col"] * 10 + r["tw"]] = a
        assert np.array_equal(got, dem._MODES[mode](img, {})), mode


def test_pansharpen_brovey_properties():
    import numpy as np
    from gdal_scripts_spark import raster

    rng = np.random.default_rng(5)
    # single-band ms with weight 1: ratio cancels, output == pan exactly
    ms = rng.integers(10, 250, (8, 8, 1)).astype(np.uint8)
    pan = rng.integers(10, 250, (16, 16)).astype(np.uint8)
    out = raster.np_pansharpen(ms, pan, weights=(1.0,))
    assert np.array_equal(out[:, :, 0], pan)
    # RGB: per-pixel band RATIOS are preserved (Brovey invariant)
    ms3 = rng.integers(20, 240, (8, 8, 3)).astype(np.uint8)
    out3 = raster.np_pansharpen(ms3, pan).astype(np.float64)
    up = ms3[np.ix_(np.arange(16) * 8 // 16, np.arange(16) * 8 // 16)].astype(np.float64)
    got_ratio = out3[:, :, 0] / np.maximum(out3[:, :, 1], 1)
    want_ratio = up[:, :, 0] / np.maximum(up[:, :, 1], 1)
    assert np.abs(got_ratio - want_ratio).mean() < 0.1


def test_pansharpen_spark(spark):
    from gdal_scripts_spark import fixtures, raster

    imgs = fixtures.images_spark(spark, n=12).filter("fmt = 'ppm'")
    pan = raster.translate(imgs, "pgm", bands=[0])
    rows = raster.pansharpen(imgs, pan).collect()
    assert len(rows) == imgs.count()
    for r in rows:
        assert r["fmt"] == "ppm" and r["w"] > 0


def test_dither_fs_properties():
    import numpy as np
    from gdal_scripts_spark import palette

    pal = np.array([[0, 0, 0], [255, 255, 255], [128, 0, 0]], np.int32)
    # exact palette color -> constant index, no diffusion artifacts
    img = np.full((6, 6, 3), 255, np.uint8)
    idx = palette.np_dither_fs(img, pal)
    assert (idx == 1).all()
    # mid-gray against black/white palette: diffusion preserves the mean
    gray = np.full((24, 24, 3), 128, np.uint8)
    idx2 = palette.np_dither_fs(gray, pal[:2])
    approx = pal[:2][idx2].mean()
    assert abs(approx - 128.0) < 8.0
    # deterministic
    assert np.array_equal(idx2, palette.np_dither_fs(gray, pal[:2]))


def test_dither_spark(spark):
    from gdal_scripts_spark import fixtures, palette

    imgs = fixtures.images_spark(spark, n=10)
    indexed, pal = palette.dither_to_palette(imgs, n_colors=16)
    rows = indexed.collect()
    assert len(rows) == 10
    assert len(pal) <= 16


# ---------------------------------------------------------------------------
# gdaldem color-relief (GDALColorRelief analog: piecewise-linear ramp)
# ---------------------------------------------------------------------------


def _ramp_lookup_scalar(v, ramp):
    """Per-pixel reference: linear interp between stops, clamped outside."""
    if v <= ramp[0][0]:
        return ramp[0][1:]
    if v >= ramp[-1][0]:
        return ramp[-1][1:]
    for (e0, *c0), (e1, *c1) in zip(ramp, ramp[1:]):
        if e0 <= v <= e1:
            t = (v - e0) / (e1 - e0)
            return tuple(round(a + t * (b - a)) for a, b in zip(c0, c1))
    raise AssertionError


def test_color_relief_matches_scalar_reference():
    rng = np.random.default_rng(7)
    z = rng.integers(0, 256, size=(13, 11), dtype=np.uint8)
    out = dem.np_color_relief(z)
    assert out.shape == (13, 11, 3) and out.dtype == np.uint8
    for y in range(z.shape[0]):
        for x in range(z.shape[1]):
            assert tuple(out[y, x]) == _ramp_lookup_scalar(int(z[y, x]), dem.DEFAULT_RAMP)


def test_color_relief_clamps_outside_ramp():
    ramp = [(50, 10, 20, 30), (100, 110, 120, 130)]
    z = np.array([[0, 50, 75, 100, 255]], dtype=np.uint8)
    out = dem.np_color_relief(z, ramp)
    assert tuple(out[0, 0]) == (10, 20, 30)        # below -> first stop
    assert tuple(out[0, 1]) == (10, 20, 30)
    assert tuple(out[0, 2]) == (60, 70, 80)        # midpoint
    assert tuple(out[0, 3]) == (110, 120, 130)
    assert tuple(out[0, 4]) == (110, 120, 130)     # above -> last stop


def test_color_relief_spark_end_to_end(spark):
    labels = fixtures.labels_spark(spark, n=3)
    rows = dem.gdaldem(labels, "color-relief").collect()
    assert len(rows) == 3
    src = {r.image_id: r for r in labels.select("image_id", "bytes", "fmt").collect()}
    for r in rows:
        assert r.fmt == "ppm"
        img = codecs.decode(bytes(r.bytes), "ppm")
        assert img.shape == (r.h, r.w, 3)
        zin = codecs.decode(bytes(src[r.image_id].bytes), src[r.image_id].fmt)
        z = zin[:, :, 0] if zin.ndim == 3 else zin
        np.testing.assert_array_equal(img, dem.np_color_relief(z))


def test_color_relief_rejected_on_tiled_path(spark):
    from gdal_scripts_spark import raster

    labels = fixtures.labels_spark(spark, n=1)
    tiles = raster.retile(labels, tile_w=8, tile_h=8, pad=False)
    with pytest.raises(ValueError, match="point op"):
        dem.gdaldem_tiled(tiles, "color-relief")

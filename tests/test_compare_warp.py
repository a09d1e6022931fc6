"""gdalcompare analog (PSNR gate) + standalone warp_resize (R5)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_scripts_spark import compare, fixtures, raster


def _img(h=12, w=9, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, c), dtype=np.uint8)


def test_warp_identity_nearest():
    img = _img()
    out = raster.np_warp_resize(img, img.shape[1], img.shape[0], "nearest")
    assert np.array_equal(out, img)


def test_warp_upscale_2x_nearest_duplicates():
    img = _img(4, 3)
    out = raster.np_warp_resize(img, 6, 8, "nearest")
    assert np.array_equal(out, np.repeat(np.repeat(img, 2, axis=0), 2, axis=1))


def test_warp_average_integer_shrink_is_box_mean():
    img = _img(8, 6)
    out = raster.np_warp_resize(img, 3, 4, "average")
    exp = np.clip(
        np.rint(img.reshape(4, 2, 3, 2, 3).mean(axis=(1, 3))), 0, 255
    ).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_warp_bilinear_constant_preserved():
    img = np.full((10, 10, 3), 77, np.uint8)
    out = raster.np_warp_resize(img, 7, 13, "bilinear")
    assert out.shape == (13, 7, 3)
    assert np.all(out == 77)


def test_np_psnr():
    a = _img()
    assert compare.np_psnr(a, a) == float("inf")
    b = a.copy()
    b[0, 0, 0] = int(b[0, 0, 0]) ^ 1
    assert compare.np_psnr(a, b) > 40.0


def test_compare_identical_tables(spark):
    images = fixtures.images_spark(spark, n=12)
    rows = compare.compare_images(images, images).collect()
    assert len(rows) == 12
    for r in rows:
        assert r["identical"] and r["same_dims"]
        assert r["checksum_l"] == r["checksum_r"]
        assert r["psnr_db"] == float("inf")


def test_jpeg_roundtrip_passes_psnr_gate(spark):
    images = fixtures.images_spark(spark, n=10, fmts=("ppm",))
    jpegs = raster.translate(images, "jpeg")
    rows = compare.psnr_gate(images, jpegs).collect()
    assert len(rows) == 10
    bad = [r for r in rows if not r["passes_gate"]]
    assert not bad, f"PSNR<40 for {[(r['image_id'], r['psnr_db']) for r in bad]}"


def test_warp_resize_spark(spark):
    images = fixtures.images_spark(spark, n=8)
    out = raster.warp_resize(images, scale=0.5, method="average").collect()
    src = {r["image_id"]: r for r in images.select("image_id", "w", "h").collect()}
    assert len(out) == 8
    for r in out:
        s = src[r["image_id"]]
        assert r["w"] == max(1, round(s["w"] * 0.5))
        assert r["h"] == max(1, round(s["h"] * 0.5))

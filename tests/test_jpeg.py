"""Baseline JPEG codec: the lossy-tier PSNR>=40 gate (BASELINE.json :
input_hint), structural validity, and the Spark image path end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_scripts_spark import codecs, codecs_jpeg, fixtures


def _fixture_img(i, w=40, h=48):
    ys, xs = np.mgrid[0:h, 0:w]
    return ((xs[:, :, None] * 3 + ys[:, :, None] * 5
             + np.arange(3)[None, None, :] * 7 + i) % 256).astype(np.uint8)


def test_psnr_gate_rgb():
    for i in (0, 7, 123):
        img = _fixture_img(i)
        out = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
        assert out.shape == img.shape
        assert codecs.psnr(img, out) >= 40.0, i


def test_psnr_gate_gray():
    ys, xs = np.mgrid[0:33, 0:41]
    g = ((xs * 7 + ys * 3) % 256).astype(np.uint8)
    out = codecs.decode(codecs_jpeg.encode_jpeg(g, 90), "jpeg")
    assert out.shape == g.shape
    assert codecs.psnr(g, out) >= 40.0


def test_structure_markers():
    buf = codecs.encode(_fixture_img(1), "jpeg")
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert b"JFIF" in buf[:32]
    # no bare FF inside entropy data except stuffed/markers: decoder proves it
    codecs_jpeg.decode_jpeg(buf)


@settings(max_examples=15, deadline=None)
@given(w=st.integers(1, 33), h=st.integers(1, 33), seed=st.integers(0, 999))
def test_roundtrip_any_size(w, h, seed):
    rng = np.random.default_rng(seed)
    # smooth random field (JPEG-friendly): low-freq gradient + mild noise
    ys, xs = np.mgrid[0:h, 0:w]
    base = (xs * rng.integers(1, 5) + ys * rng.integers(1, 5)) % 256
    img = np.stack([(base + c * 9) % 256 for c in range(3)], axis=2).astype(np.uint8)
    out = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
    assert out.shape == img.shape
    assert codecs.psnr(img, out) >= 30.0


def test_dc_continuity_large_flat():
    img = np.full((64, 64, 3), 200, np.uint8)
    out = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
    assert codecs.psnr(img, out) > 50.0


def test_jpeg_through_spark_pipeline(spark):
    import pandas as pd

    from gdal_scripts_spark import raster

    img = _fixture_img(5, w=32, h=32)
    pdf = pd.DataFrame([{
        "image_id": "j0", "bytes": codecs.encode(img, "jpeg"), "w": 32, "h": 32,
        "fmt": "jpeg", "caption": "x", "phash": 0, "lon": 10.0, "lat": 45.0,
    }])
    df = spark.createDataFrame(pdf, schema=fixtures.IMAGES_SCHEMA)
    # stats path decodes jpeg inside Arrow batches
    stats = {r["band"]: r for r in raster.global_band_stats(df).collect()}
    dec = codecs.decode(codecs.encode(img, "jpeg"), "jpeg")
    for b in range(3):
        assert stats[b]["vmin"] == dec[:, :, b].min()
        assert abs(stats[b]["mean"] - dec[:, :, b].mean()) < 1e-9
    # translate jpeg -> png preserves the decoded pixels exactly
    conv = raster.translate(df, "png").collect()[0]
    assert np.array_equal(codecs.decode(bytes(conv["bytes"]), "png"), dec)


def test_reject_garbage():
    with pytest.raises(ValueError):
        codecs_jpeg.decode_jpeg(b"not a jpeg at all")

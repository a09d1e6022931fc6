"""Pixel probe, resumable tile sink, native geometry columns, phash dedup."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import cells, codecs, fixtures, geom, probe, raster


def test_probe_pixels(spark):
    img = np.arange(0, 300, dtype=np.uint8).reshape(10, 10, 3) % 256
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    lon, lat = 10.0, 45.0
    pdf = pd.DataFrame([{
        "image_id": "p0", "bytes": codecs.encode(img, "ppm"), "w": 12, "h": 10,
        "fmt": "ppm", "caption": "x", "phash": 0, "lon": lon, "lat": lat,
    }])
    images = spark.createDataFrame(pdf, schema=fixtures.IMAGES_SCHEMA)
    # probe at the center of pixel (px=3, py=7): anchor + (3.5, -7.5)*pix_m
    mx0, my1 = cells.np_lonlat_to_meters(lon, lat)
    pm = raster.DEFAULT_PIX_M
    plon, plat = cells.np_meters_to_lonlat(mx0 + 3.5 * pm, my1 - 7.5 * pm)
    probes = spark.createDataFrame(
        [(1, float(plon), float(plat)), (2, 0.0, 0.0)],
        "probe_id long, lon double, lat double",
    )
    rows = probe.probe_pixels(probes, images).collect()
    assert len(rows) == 1  # probe 2 is outside every footprint
    r = rows[0]
    assert (r["probe_id"], r["px"], r["py"]) == (1, 3, 7)
    assert r["value"] == [int(v) for v in img[7, 3]]


def test_write_tiles_resume(spark, tmp_path):
    images = fixtures.images_spark(spark, n=20)
    out, man = str(tmp_path / "tiles"), str(tmp_path / "manifest")
    m1 = probe.write_tiles(images, out, man, z=12, n_units=4, run_id="w1")
    assert m1["units_run"] == 4 and m1["rows_out"] > 0
    n1 = spark.read.parquet(out).count()
    m2 = probe.write_tiles(images, out, man, z=12, n_units=4, run_id="w2")
    assert m2["resumed"] is True
    assert spark.read.parquet(out).count() == n1
    # per-image tiles match the map-only path directly
    direct = raster.cut_image_tiles(images, z=12).count()
    assert n1 == direct


def test_cut_image_tiles_matches_mosaic_when_disjoint(spark):
    # one image -> mosaic path and per-image path must agree exactly
    pdf = fixtures.make_images_pdf(1)
    images = spark.createDataFrame(pdf, schema=fixtures.IMAGES_SCHEMA)
    a = {(r["tx"], r["ty"]): r["checksum"]
         for r in raster.cut_base_tiles(images, z=12).collect()}
    b = {(r["tx"], r["ty"]): r["checksum"]
         for r in raster.cut_image_tiles(images, z=12).collect()}
    assert a == b and len(a) > 0


def test_native_geometry_columns_match_numpy(spark):
    polys = fixtures.polygons_spark(spark, p=20)
    recs = fixtures.make_polygons_records(20)
    rows = polys.select(
        "poly_id",
        probe.polygon_area_col(F.col("rings")).alias("area2"),
        probe.polygon_centroid_col(F.col("rings")).alias("cen"),
        probe.polygon_bbox_col(F.col("rings")).alias("bb"),
    ).collect()
    got = {r["poly_id"]: r for r in rows}
    for rec in recs:
        r = got[rec["poly_id"]]
        assert abs(r["area2"] - rec["area"]) < 1e-9
        cx, cy = geom.ring_centroid(rec["rings_np"][0])
        assert abs(r["cen"]["cx"] - cx) < 1e-9 and abs(r["cen"]["cy"] - cy) < 1e-9
        assert abs(r["bb"]["xmin"] - rec["bbox"][0]) < 1e-12
        assert abs(r["bb"]["ymax"] - rec["bbox"][3]) < 1e-12


def test_geometry_columns_stay_native(spark):
    polys = fixtures.polygons_spark(spark, p=5)
    plan = polys.select(
        probe.polygon_area_col(F.col("rings")).alias("a")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_hamming_dedup_pairs(spark):
    # plant near-dup phashes (<=2 bits apart) and far ones
    rows = [
        ("a", 0x0F0F0F0F0F0F0F0F),
        ("b", 0x0F0F0F0F0F0F0F0E),       # 1 bit from a
        ("c", 0x0F0F0F0F0F0F0F0C),       # 2 bits from a
        ("d", -0x70F0F0F0F0F0F10),       # far from everything
    ]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in probe.hamming_dedup_pairs(df, max_hamming=3).collect()}
    assert pairs[("a", "b")] == 1
    assert pairs[("a", "c")] == 2
    assert pairs[("b", "c")] == 1
    assert not any("d" in k for k in pairs)


def test_hamming_dedup_recall_is_exact(spark):
    # random 64-bit phashes + planted near pairs: block bucketing must have
    # recall exactly 1.0 at the advertised radius (pigeonhole, 9 blocks @ h=8)
    import numpy as np

    rng = np.random.default_rng(17)
    base = rng.integers(-(1 << 63), 1 << 63, 60, dtype=np.int64)
    rows = [(f"r{i}", int(h)) for i, h in enumerate(base)]
    # planted: flip exactly 8 scattered bits of the first 10 (signed-64 wrap)
    for i in range(10):
        flipped = int(base[i]) & ((1 << 64) - 1)
        for b in rng.choice(64, 8, replace=False):
            flipped ^= 1 << int(b)
        if flipped >= 1 << 63:
            flipped -= 1 << 64
        rows.append((f"dup{i}", flipped))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {(r["id_a"], r["id_b"]) for r in
           probe.hamming_dedup_pairs(df, max_hamming=8).collect()}
    ids = {k: v for k, v in rows}
    import itertools
    exact = set()
    for (a, ha), (b, hb) in itertools.combinations(rows, 2):
        if bin((ha ^ hb) & ((1 << 64) - 1)).count("1") <= 8:
            exact.add(tuple(sorted((a, b))))
    got_sorted = {tuple(sorted(p)) for p in got}
    assert got_sorted == exact, (exact - got_sorted, got_sorted - exact)
    assert len(exact) >= 10  # the planted pairs are actually in the truth set

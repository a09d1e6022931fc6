from __future__ import annotations

import numpy as np
import pytest

from gdal_scripts_spark import codecs, geom, zonal


def _mk_images(n=12, w=16, h=12, seed=7):
    rng = np.random.default_rng(seed)
    recs, arrs = [], []
    for i in range(n):
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        x0 = float(rng.integers(0, 6))
        y1 = float(rng.integers(10, 16))
        recs.append((f"im{i}", codecs.encode(arr, "pgm"), "pgm", x0, y1))
        arrs.append((f"im{i}", arr.astype(np.float64), x0, y1))
    return recs, arrs


ZONES = [
    # triangle
    (10, [np.array([[1.0, 1.0], [13.0, 2.0], [4.0, 11.0]])]),
    # L-shape (non-convex)
    (11, [np.array([[6.0, 0.0], [18.0, 0.0], [18.0, 4.0], [10.0, 4.0],
                    [10.0, 14.0], [6.0, 14.0]])]),
    # square with a hole
    (12, [np.array([[0.0, 6.0], [20.0, 6.0], [20.0, 15.0], [0.0, 15.0]]),
          np.array([[5.0, 8.0], [9.0, 8.0], [9.0, 12.0], [5.0, 12.0]])]),
]


def test_zonal_stats_matches_sequential_oracle(spark):
    recs, arrs = _mk_images()
    images = spark.createDataFrame(
        recs,
        schema="image_id string, bytes binary, fmt string, x0 double, y1 double",
    ).repartition(5)
    pack = geom.PolygonPack.from_rings(ZONES)
    got = {
        int(r["zone_id"]): (
            int(r["n_images"]), int(r["n_pixels"]), float(r["v_sum"]),
            float(r["v_min"]), float(r["v_max"]),
        )
        for r in zonal.zonal_stats(images, pack).collect()
    }
    want = zonal.np_zonal_oracle(arrs, pack)
    assert set(got) == set(want)
    for z in want:
        assert got[z][0] == want[z][0], (z, got[z], want[z])
        assert got[z][1] == want[z][1], (z, got[z], want[z])
        assert got[z][2] == pytest.approx(want[z][2])
        assert got[z][3] == want[z][3] and got[z][4] == want[z][4]


def test_zonal_partials_shuffle_rows_are_tiny(spark):
    """The only shuffled relation is per-(image, zone) partials — O(images
    x zones), never O(pixels)."""
    recs, _ = _mk_images(n=8)
    images = spark.createDataFrame(
        recs,
        schema="image_id string, bytes binary, fmt string, x0 double, y1 double",
    )
    pack = geom.PolygonPack.from_rings(ZONES)
    partials = zonal.zonal_partials(images, pack)
    n = partials.count()
    assert 0 < n <= 8 * len(ZONES)


def test_zonal_mean_std_from_moments(spark):
    """Constant raster: mean == value, std == 0 exactly (moment combine)."""
    arr = np.full((6, 6), 42, dtype=np.uint8)
    images = spark.createDataFrame(
        [("c0", codecs.encode(arr, "pgm"), "pgm", 0.0, 6.0),
         ("c1", codecs.encode(arr, "pgm"), "pgm", 1.0, 6.0)],
        schema="image_id string, bytes binary, fmt string, x0 double, y1 double",
    )
    pack = geom.PolygonPack.from_rings(
        [(5, [np.array([[0.0, 0.0], [7.0, 0.0], [7.0, 6.0], [0.0, 6.0]])])]
    )
    row = zonal.zonal_stats(images, pack).collect()[0]
    assert row["v_mean"] == 42.0
    assert row["v_std"] == 0.0
    assert row["n_images"] == 2

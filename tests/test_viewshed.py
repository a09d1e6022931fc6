"""viewshed: vectorized sweeps vs per-cell brute LOS; footprint parts."""

import numpy as np

from gdal_scripts_spark import codecs, raster
from gdal_scripts_spark.viewshed import (
    np_viewshed,
    np_viewshed_brute,
    viewshed_cells,
)


def test_viewshed_vectorized_matches_brute():
    rng = np.random.default_rng(11)
    for _ in range(8):
        h, w = int(rng.integers(4, 16)), int(rng.integers(4, 16))
        dem = rng.integers(0, 15, size=(h, w)).astype(float)
        orow, ocol = int(rng.integers(0, h)), int(rng.integers(0, w))
        oh = float(rng.integers(1, 5))
        a = np_viewshed(dem, orow, ocol, oh)
        b = np_viewshed_brute(dem, orow, ocol, oh)
        assert (a == b).all(), np.argwhere(a != b)


def test_viewshed_monotone_in_observer_height():
    # raising the eye can only reveal cells, never hide them
    rng = np.random.default_rng(4)
    dem = rng.integers(0, 20, size=(12, 12)).astype(float)
    lo = np_viewshed(dem, 6, 6, 1.0)
    hi = np_viewshed(dem, 6, 6, 50.0)
    assert (lo <= hi).all()
    # an eye far above any terrain relief sees everything
    assert np_viewshed(dem, 6, 6, 1.0e6).all()


def test_viewshed_cells_spark(spark):
    dem = np.zeros((5, 12), dtype=np.uint8)
    dem[:, 6] = 9  # tall wall, observer low: everything past it hidden
    df = spark.createDataFrame(
        [("d", codecs.encode(dem, "pgm"), "pgm", 2, 1, 1.0)],
        schema="image_id string, bytes binary, fmt string, orow int, ocol int, obs_h double",
    )
    got = {
        (r["r"], r["c"]): r["visible"]
        for r in viewshed_cells(df).collect()
    }
    exp = np_viewshed(dem, 2, 1, 1.0)
    assert len(got) == 60
    for (r, c), v in got.items():
        assert v == bool(exp[r, c])
    assert not got[(2, 11)]  # behind the wall
    assert got[(2, 5)]       # in front of it


def test_footprint_two_parts_and_hole(spark):
    img = np.zeros((12, 16), dtype=np.uint8)
    img[1:6, 1:7] = 5       # part A with a hole
    img[3, 3] = 0
    img[8:11, 10:14] = 9    # part B
    df = spark.createDataFrame(
        [("x", codecs.encode(img, "pgm"), "pgm")],
        schema="image_id string, bytes binary, fmt string",
    )
    rows = sorted(
        raster.footprint(df).collect(), key=lambda r: r["part_id"]
    )
    assert len(rows) == 2
    a, b = rows
    assert a["n_px"] == 5 * 6 - 1
    assert (a["xmin"], a["ymin"], a["xmax"], a["ymax"]) == (1, 1, 7, 6)
    assert "POLYGON ((" in a["wkt"] and ", (" in a["wkt"]  # carries the hole
    assert b["n_px"] == 12
    assert (b["xmin"], b["ymin"], b["xmax"], b["ymax"]) == (10, 8, 14, 11)
    assert b["n_vertices"] == 4

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


# ---------------------------------------------------------------------------
# R5 depth (round 3): cubic kernel + inverse-map reprojection — analytic
# goldens, independent of the engine's own output (Keys a=-0.5 reproduces
# polynomials up to degree 2 exactly; bilinear reproduces degree 1).
# ---------------------------------------------------------------------------

def _interior_coords(w, h):
    uf = np.linspace(3.3, w - 4.7, 23)
    vf = np.linspace(2.9, h - 3.1, 19)
    return uf, vf


def test_cubic_reproduces_quadratic_exactly():
    h, w = 40, 50
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (0.3 * xs**2 + 0.2 * ys**2 + 0.1 * xs * ys + 5 * xs - 3 * ys + 7)[
        :, :, None
    ]
    uf, vf = _interior_coords(w, h)
    out = raster.np_sample_sep(img, uf, vf, "cubic")
    U, V = np.meshgrid(uf, vf)
    want = 0.3 * U**2 + 0.2 * V**2 + 0.1 * U * V + 5 * U - 3 * V + 7
    assert np.abs(out[:, :, 0] - want).max() < 1e-9


def test_bilinear_reproduces_linear_exactly():
    h, w = 30, 30
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (5 * xs - 3 * ys + 7)[:, :, None]
    uf, vf = _interior_coords(w, h)
    out = raster.np_sample_sep(img, uf, vf, "bilinear")
    U, V = np.meshgrid(uf, vf)
    assert np.abs(out[:, :, 0] - (5 * U - 3 * V + 7)).max() < 1e-9


def test_cubicspline_partition_of_unity():
    img = np.full((20, 20, 1), 42.0)
    uf, vf = _interior_coords(20, 20)
    out = raster.np_sample_sep(img, uf, vf, "cubicspline")
    assert np.abs(out - 42.0).max() < 1e-9


def test_cubic_uint8_resize_shape_and_range():
    img = _img(16, 16)
    out = raster.np_warp_resize(img, 24, 24, "cubic")
    assert out.shape == (24, 24, 3) and out.dtype == np.uint8


def test_reproject_linear_field_matches_independent_map():
    """Independent oracle: the test recomputes the 3857->4326 inverse map
    with its own mercator math; a linear-in-pixel field must round-trip
    exactly under bilinear."""
    import math as m

    h, w, pix_m = 36, 44, 150.0
    lon0, lat0 = 12.0, 47.0
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (2.0 * xs + 0.5 * ys + 3.0)[:, :, None]
    out, (lw, ls, le, ln_) = raster.np_warp_reproject_geodetic(
        img, lon0, lat0, pix_m, method="bilinear"
    )
    assert (lw, ln_) == (lon0, lat0) and ls < ln_ and le > lw
    OS = 2 * m.pi * 6378137.0 / 2.0
    mx0 = lon0 * OS / 180.0
    my0 = m.log(m.tan((90 + lat0) * m.pi / 360.0)) / (m.pi / 180.0) * OS / 180.0
    lons = lon0 + (np.arange(w) + 0.5) * (le - lon0) / w
    lats = lat0 + (np.arange(h) + 0.5) * (ls - lat0) / h
    uf = (lons * OS / 180.0 - mx0) / pix_m - 0.5
    mys = np.log(np.tan((90 + lats) * np.pi / 360.0)) / (np.pi / 180.0) * OS / 180.0
    vf = (my0 - mys) / pix_m - 0.5
    # interior only (edge clamping breaks linearity at the border row/col)
    U, V = np.meshgrid(uf, vf)
    want = 2.0 * U + 0.5 * V + 3.0
    inner = (slice(2, -2), slice(2, -2))
    assert np.abs(out[:, :, 0][inner] - want[inner]).max() < 1e-9


def test_reproject_rows_sample_nonuniformly():
    """The vertical inverse map must carry the Mercator nonlinearity:
    vf spacing at the north edge differs from the south edge."""
    img = np.zeros((64, 8, 1))
    _, (lw, ls, le, ln_) = raster.np_warp_reproject_geodetic(
        img, 0.0, 60.0, 500.0, method="nearest"
    )
    lats = np.linspace(ln_, ls, 65)
    mys = np.log(np.tan((90 + lats) * np.pi / 360.0))
    d = np.diff(mys)
    assert abs(d[0]) > abs(d[-1]) * 1.0001  # strictly non-uniform


def test_warp_reproject_spark_roundtrip(spark):
    imgs = fixtures.images_spark(spark, n=6)
    out = raster.warp_reproject(imgs, method="cubic").collect()
    assert len(out) == 6
    for r in out:
        assert r.lat_s < r.lat_n and r.lon_w < r.lon_e
        assert r.w > 0 and r.h > 0 and 0 <= r.checksum < 65536


# ---------------------------------------------------------------------------
# R5 round 3b: lanczos, footprint-reduce kernels, cutline — closed forms
# ---------------------------------------------------------------------------

def test_lanczos_identity_at_scale_1():
    # sinc vanishes at nonzero integers: d=0 taps = identity
    img = _img(10, 7)
    out = raster.np_warp_resize(img, 7, 10, "lanczos")
    assert np.array_equal(out, img)


def test_lanczos_constant_preserved():
    img = np.full((12, 12, 3), 137, np.uint8)
    out = raster.np_warp_resize(img, 7, 5, "lanczos")
    assert np.array_equal(out, np.full((5, 7, 3), 137, np.uint8))


def test_lanczos_weights_normalized_and_6tap():
    w = raster._lanczos_weights(np.linspace(0, 0.999, 17))
    assert w.shape[0] == 6
    assert np.allclose(w.sum(axis=0), 1.0)


def test_reduce_kernels_closed_form():
    # one 2x2 output, 3x3 blocks with known order statistics
    img = np.zeros((6, 6, 1), np.uint8)
    img[:3, :3, 0] = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    img[:3, 3:, 0] = [[10, 10, 10], [10, 20, 20], [30, 30, 40]]
    img[3:, :3, 0] = 7
    img[3:, 3:, 0] = [[0, 0, 0], [0, 0, 0], [0, 0, 255]]
    want = {
        "min": [[1, 10], [7, 0]],
        "max": [[9, 40], [7, 255]],
        # lower order statistic at index floor(q*(n-1)), n=9 -> med idx 4,
        # q1 idx 2, q3 idx 6
        "med": [[5, 20], [7, 0]],
        "q1": [[3, 10], [7, 0]],
        "q3": [[7, 30], [7, 0]],
        "sum": [[45, 180], [63, 255]],    # sum clips at 255
        "mode": [[1, 10], [7, 0]],        # all-distinct ties -> smallest
    }
    for m, exp in want.items():
        got = raster.np_warp_resize(img, 2, 2, m)[:, :, 0].tolist()
        assert got == exp, (m, got)


def test_reduce_kernel_rejects_non_integer_shrink():
    img = _img(6, 6)
    with pytest.raises(ValueError):
        raster.np_warp_resize(img, 4, 4, "med")


def test_cutline_rect_equals_bbox_mask():
    """Rectangular cutline == independent bbox test on pixel centers."""
    from gdal_scripts_spark import cells
    img = np.full((20, 16, 1), 200, np.uint8)
    lon0, lat0, pix_m = 10.0, 45.0, 100.0
    # cutline rect in lon/lat strictly inside the footprint
    os_m = cells.ORIGIN_SHIFT
    mx0 = lon0 * os_m / 180.0
    import math
    my0 = math.log(math.tan((90 + lat0) * math.pi / 360)) / (math.pi / 180) * os_m / 180
    # rect covering source pixels [3, 11) x [5, 14) exactly (pixel edges)
    rx0, rx1 = mx0 + 3 * pix_m, mx0 + 11 * pix_m
    ry1, ry0 = my0 - 5 * pix_m, my0 - 14 * pix_m
    lon_a, _ = cells.np_meters_to_lonlat(np.array([rx0, rx1]), np.zeros(2))
    _, lat_a = cells.np_meters_to_lonlat(np.zeros(2), np.array([ry0, ry1]))
    ring = np.array([(lon_a[0], lat_a[0]), (lon_a[1], lat_a[0]),
                     (lon_a[1], lat_a[1]), (lon_a[0], lat_a[1])])
    out, kept = raster.np_cutline_apply(img, lon0, lat0, pix_m, [ring], nodata=0)
    assert kept == (11 - 3) * (14 - 5)
    want = np.zeros((20, 16), bool)
    want[5:14, 3:11] = True
    assert np.array_equal(out[:, :, 0] != 0, want)


def test_cutline_hole_subtracts(spark):
    imgs = fixtures.images_spark(spark, n=5)
    # one big ring covering everything, plus a hole that nukes a band:
    outer = np.array([(-180, -85), (180, -85), (180, 85), (-180, 85)], float)
    rows_all = raster.warp_cutline(imgs, [outer]).select("image_id", "kept", "total").collect()
    assert all(r.kept == r.total for r in rows_all)
    # hole centered on the first image's anchor (guaranteed overlap)
    a = imgs.select("lon", "lat").first()
    hole = np.array([(a.lon - 1, a.lat - 1), (a.lon + 1, a.lat - 1),
                     (a.lon + 1, a.lat + 1), (a.lon - 1, a.lat + 1)], float)
    rows_hole = raster.warp_cutline(imgs, [outer, hole]).select(
        "image_id", "kept", "total").collect()
    kept_by_id = {r.image_id: r.kept for r in rows_hole}
    assert any(kept_by_id[r.image_id] < r.total for r in rows_all)


# ---------------------------------------------------------------------------
# UTM warp (non-separable inverse map)
# ---------------------------------------------------------------------------

def test_utm_warp_constant_preserved():
    img = np.full((24, 30, 3), 77.0)
    out, bbox, zone = raster.np_warp_reproject_utm(
        img, lon0=8.2, lat0=45.0, pix_m=100.0)
    assert out.shape == img.shape
    assert np.allclose(out, 77.0)
    assert zone == 32
    e0, n0, e1, n1 = bbox
    assert e0 < e1 and n0 < n1
    # zone 32 spans 6..12 deg; 8.2 deg is west of the 9-deg central meridian
    assert 0 < e0 < 500000.0


def test_utm_warp_bilinear_linear_ramp_scalar_loop():
    # img linear in source pixel indices -> bilinear output must equal the
    # ramp at the (clamped) inverse-mapped coordinates; expected values are
    # recomputed here with a straightforward per-pixel scalar loop, pinning
    # the vectorized 2-D gather in np_sample_2d
    h, w = 16, 20
    rr, cc = np.mgrid[0:h, 0:w]
    img = (2.0 * cc + 3.0 * rr)[:, :, None].astype(np.float64)
    lon0, lat0, pix = -61.7, -33.4, 80.0   # southern hemisphere, zone 20
    out, _bbox, zone = raster.np_warp_reproject_utm(img, lon0, lat0, pix)
    assert zone == 20

    import math
    os_m = 20037508.342789244
    mx0 = lon0 * os_m / 180.0
    my0 = math.log(math.tan((90.0 + lat0) * math.pi / 360.0)) / (
        math.pi / 180.0) * os_m / 180.0
    clon = np.array([lon0, (mx0 + w * pix) / os_m * 180.0])
    cy = np.array([my0, my0 - h * pix])
    _, clat = __import__("gdal_scripts_spark.cells", fromlist=["x"]).np_meters_to_lonlat(
        np.zeros(2), cy)
    from gdal_scripts_spark import cells
    corner_lon = np.array([clon[0], clon[1], clon[0], clon[1]])
    corner_lat = np.array([clat[0], clat[0], clat[1], clat[1]])
    ce, cn = cells.np_lonlat_to_utm(corner_lon, corner_lat, 20,
                                    south=np.ones(4, bool))
    e0, e1, n0, n1 = ce.min(), ce.max(), cn.min(), cn.max()
    for j in range(2, h - 2):
        for i in range(2, w - 2):
            e = e0 + (i + 0.5) * (e1 - e0) / w
            n = n1 - (j + 0.5) * (n1 - n0) / h
            glon, glat = cells.np_utm_to_lonlat(
                np.array([e]), np.array([n]), 20, np.array([True]))
            uf = (glon[0] * os_m / 180.0 - mx0) / pix - 0.5
            gmy = math.log(math.tan((90.0 + glat[0]) * math.pi / 360.0)) / (
                math.pi / 180.0) * os_m / 180.0
            vf = (my0 - gmy) / pix - 0.5
            ufc = min(max(uf, 0.0), w - 1.0)
            vfc = min(max(vf, 0.0), h - 1.0)
            assert abs(out[j, i, 0] - (2.0 * ufc + 3.0 * vfc)) < 1e-9


def test_utm_warp_rotates_by_grid_convergence():
    # away from the central meridian a meridian-aligned vertical stripe must
    # come out TILTED by the grid convergence (the non-separable signature
    # the geodetic warp cannot produce): gamma ~ atan(tan(dlam)*sin(lat)),
    # ~2.1 deg at dlam=3, lat=45 -> across 60 rows the stripe center shifts
    # by ~60*tan(gamma) ~ 2.2 px
    h, w = 60, 60
    img = np.zeros((h, w, 1), dtype=np.float64)
    img[:, 28:32, 0] = 100.0
    out, _b, zone = raster.np_warp_reproject_utm(
        img, lon0=11.9, lat0=45.02, pix_m=30.0)   # near zone-32 east edge
    def centroid(row):
        s = out[row, :, 0].sum()
        return float((out[row, :, 0] * np.arange(w)).sum() / s)
    drift = centroid(h - 3) - centroid(2)
    assert abs(drift) > 1.0   # separable maps keep columns vertical (= 0)


def test_utm_warp_spark(spark):
    images = fixtures.images_spark(spark, n=8)
    rows = raster.warp_reproject_utm(images).collect()
    assert len(rows) == 8
    for r in rows:
        assert 1 <= r["zone"] <= 60
        assert r["e_min"] < r["e_max"] and r["n_min"] < r["n_max"]
        assert r["w"] > 0 and r["h"] > 0 and r["checksum"] >= 0

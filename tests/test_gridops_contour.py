"""gdal_grid analogs (IDW, radius metrics) + gdal_contour + -clipsrc:
numpy oracles and grid-vs-brute parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import cells, contour, fixtures, gridops, probe


def _pts_df(spark, n=400):
    return fixtures.points_spark(spark, n).select(
        F.col("image_id").alias("pid"), "lon", "lat",
        (F.crc32(F.col("image_id")) % 100).cast("double").alias("value"),
    )


def _q_df(spark, q=12):
    return fixtures.query_points_spark(spark, q=q).select("qid", "lon", "lat")


def test_idw_grid_matches_brute(spark):
    pts = _pts_df(spark).persist()
    qs = _q_df(spark)
    grid = gridops.idw_interpolate(qs, pts, k=6, method="grid", z=4).collect()
    brute = gridops.idw_interpolate(qs, pts, k=6, method="brute").collect()
    g = {r["qid"]: (r["n_pts"], round(r["idw_value"], 6)) for r in grid}
    b = {r["qid"]: (r["n_pts"], round(r["idw_value"], 6)) for r in brute}
    assert g == b


def test_radius_metrics_matches_numpy(spark):
    pts = _pts_df(spark).persist()
    qs = _q_df(spark)
    radius = 500_000.0
    got = {
        r["qid"]: (r["n_pts"], round(r["avg_value"], 6), round(r["avg_dist_m"], 2))
        for r in gridops.radius_metrics(qs, pts, radius_m=radius, z=5).collect()
    }
    p = pts.toPandas()
    exp = {}
    for q in qs.collect():
        d = cells.np_haversine_m(
            q["lon"], q["lat"], p["lon"].to_numpy(), p["lat"].to_numpy()
        )
        m = d <= radius
        if m.any():
            exp[q["qid"]] = (
                int(m.sum()),
                round(float(p["value"].to_numpy()[m].mean()), 6),
                round(float(d[m].mean()), 2),
            )
    assert got == exp


def test_nearest_value_is_knn1(spark):
    pts = _pts_df(spark, n=200).persist()
    qs = _q_df(spark, q=8)
    nv = gridops.nearest_value(qs, pts, z=4).collect()
    p = pts.toPandas()
    for r in nv:
        q = [x for x in qs.collect() if x["qid"] == r["qid"]][0]
        d = cells.np_haversine_m(q["lon"], q["lat"], p["lon"].to_numpy(), p["lat"].to_numpy())
        best = d.min()
        assert r["dist_m"] == pytest.approx(best, rel=1e-12)


# ---------------------------------------------------------------------------
# contour
# ---------------------------------------------------------------------------

def test_contour_ramp():
    h, w = 6, 9
    z = np.tile(np.arange(w, dtype=np.float64), (h, 1))
    # level 2.5 crosses between x=2 and x=3 at x=2.5: one vertical segment
    # per cell row -> h-1 segments, total length h-1
    s = contour.np_contour_segments(z, 2.5)
    assert len(s) == h - 1
    lengths = np.hypot(s[:, 2] - s[:, 0], s[:, 3] - s[:, 1])
    assert np.allclose(lengths, 1.0)
    assert np.allclose(s[:, 1], 2.5) and np.allclose(s[:, 3], 2.5)


def test_contour_constant_empty():
    z = np.full((5, 5), 7.0)
    assert len(contour.np_contour_segments(z, 3.5)) == 0
    assert contour.np_contour_levels(7.0, 7.0, 1.0, 0.5) == []


def test_contour_circle_closed_length():
    # disc: iso-line should approximate a circle; total length within 5% of
    # 2*pi*r and every cell contributes connectable segments
    n = 64
    ys, xs = np.mgrid[0:n, 0:n]
    z = -np.sqrt((xs - 32.0) ** 2 + (ys - 32.0) ** 2)
    s = contour.np_contour_segments(z, -20.0)
    length = np.hypot(s[:, 2] - s[:, 0], s[:, 3] - s[:, 1]).sum()
    assert abs(length - 2 * np.pi * 20.0) / (2 * np.pi * 20.0) < 0.05


def test_contour_metrics_spark(spark):
    labels = fixtures.labels_spark(spark, n=4)
    rows = contour.contour_metrics(labels, interval=1.0, base=0.5).collect()
    assert len(rows) > 0
    # every level must be base + k*interval and lengths positive
    for r in rows:
        assert abs((r["level"] - 0.5) % 1.0) < 1e-9
        assert r["n_segments"] > 0 and r["length_px"] > 0


# ---------------------------------------------------------------------------
# clip
# ---------------------------------------------------------------------------

def test_clip_polygons_rect_matches_numpy(spark):
    from gdal_scripts_spark import geom

    polys = fixtures.polygons_spark(spark, p=30)
    box = (-60.0, -30.0, 60.0, 45.0)
    got = {
        r["poly_id"]: (round(r["clipped_area"], 6), r["n_rings_out"])
        for r in probe.clip_polygons_rect(polys, *box).collect()
    }
    exp = {}
    for rec in fixtures.make_polygons_records(30, fixtures.SEED + 1):
        area, n_out = 0.0, 0
        for k, ring in enumerate(rec["rings_np"]):
            c = geom.clip_ring_rect(ring, *box)
            if len(c) >= 3:
                a = abs(geom.shoelace_area(c))
                area += a if k == 0 else -a
                n_out += 1
        if n_out:
            exp[rec["poly_id"]] = (round(area, 6), n_out)
    assert got == exp


def test_contour_stitching_circle_ring():
    # radial bump: iso-line at mid level is one closed ring
    import numpy as np
    from gdal_scripts_spark import contour

    y, x = np.mgrid[0:21, 0:21]
    z = 100.0 - ((y - 10.0) ** 2 + (x - 10.0) ** 2)
    # 49.5: no lattice point satisfies d^2 == 50.5, so no exact-corner
    # crossings -> no degenerate zero-length segments in the soup
    segs = contour.np_contour_segments(z, 49.5)
    lines = contour.np_stitch_segments(segs)
    assert len(lines) == 1
    ring = lines[0]
    assert np.array_equal(ring[0], ring[-1])          # closed
    # every original segment endpoint appears exactly once in the walk
    assert len(ring) == len(segs) + 1
    # total length preserved by stitching
    seg_len = np.hypot(segs[:, 2] - segs[:, 0], segs[:, 3] - segs[:, 1]).sum()
    ring_len = np.hypot(np.diff(ring[:, 0]), np.diff(ring[:, 1])).sum()
    assert abs(seg_len - ring_len) < 1e-9


def test_contour_stitching_open_line():
    import numpy as np
    from gdal_scripts_spark import contour

    # monotonic ramp: iso-line is one open polyline border-to-border
    z = np.tile(np.arange(10.0), (6, 1))
    segs = contour.np_contour_segments(z, 4.5)
    lines = contour.np_stitch_segments(segs)
    assert len(lines) == 1
    line = lines[0]
    assert not np.array_equal(line[0], line[-1])      # open
    assert len(line) == len(segs) + 1
    # deterministic: re-stitching gives the identical walk
    again = contour.np_stitch_segments(segs)
    assert np.array_equal(line, again[0])


def test_contour_polylines_spark(spark):
    from gdal_scripts_spark import contour, fixtures

    labels = fixtures.labels_spark(spark, n=4)
    rows = contour.contour_polylines(labels, interval=2.0, base=0.5).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["wkt"].startswith("LINESTRING (")
        assert r["n_pts"] >= 2
        assert r["length_px"] > 0


# ---------------------------------------------------------------------------
# gdal_grid -a linear (TIN)
# ---------------------------------------------------------------------------

def test_delaunay_empty_circumcircle():
    from gdal_scripts_spark.gridops import np_delaunay
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 10, size=(50, 2))
    tris = np_delaunay(pts)
    assert len(tris) >= 50  # ~2n triangles for a generic cloud
    for t in tris:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        d = 2 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1]) + c[0] * (a[1] - b[1]))
        ux = ((a @ a) * (b[1] - c[1]) + (b @ b) * (c[1] - a[1]) + (c @ c) * (a[1] - b[1])) / d
        uy = ((a @ a) * (c[0] - b[0]) + (b @ b) * (a[0] - c[0]) + (c @ c) * (b[0] - a[0])) / d
        r = np.hypot(a[0] - ux, a[1] - uy)
        dist = np.hypot(pts[:, 0] - ux, pts[:, 1] - uy)
        inside = dist < r - 1e-9
        inside[list(t)] = False
        assert not inside.any(), "non-Delaunay triangle (non-empty circumcircle)"


def test_tin_interpolation_properties():
    from gdal_scripts_spark.gridops import np_tin_interpolate
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 10, size=(40, 2))
    # exact plane reproduction for any triangulation
    plane = 1.7 + 0.31 * pts[:, 0] - 0.89 * pts[:, 1]
    qx, qy = rng.uniform(3, 7, 30), rng.uniform(3, 7, 30)
    got = np_tin_interpolate(pts, plane, qx, qy)
    assert np.allclose(got, 1.7 + 0.31 * qx - 0.89 * qy, atol=1e-9)
    # outside the hull -> NaN (gdal_grid nodata)
    out = np_tin_interpolate(pts, plane, np.array([50.0]), np.array([50.0]))
    assert np.isnan(out).all()
    # range property: linear interp never overshoots the data
    vals = rng.uniform(-5, 5, 40)
    got = np_tin_interpolate(pts, vals, qx, qy)
    ok = ~np.isnan(got)
    assert got[ok].min() >= vals.min() - 1e-9
    assert got[ok].max() <= vals.max() + 1e-9


def test_linear_interpolate_halo_across_tiles(spark):
    # points on BOTH sides of the z=3 tile boundary at lon=45: a node just
    # left of the boundary is only inside the hull thanks to halo points
    # replicated from the right-hand tile
    from gdal_scripts_spark import gridops
    pts = [
        (1, 40.0, 10.0), (2, 40.0, 20.0),          # left tile
        (3, 49.0, 10.0), (4, 49.0, 20.0),          # right tile
        (5, 44.0, 15.0), (6, 46.0, 15.0),
    ]
    points = spark.createDataFrame(
        pts, schema="pid long, lon double, lat double"
    ).withColumn("value", 2.0 + 1.0 * F.col("lon"))
    nodes = spark.createDataFrame(
        [(1, 44.9, 15.0), (2, 45.1, 15.0)], schema="qid long, lon double, lat double"
    )
    got = {
        r["qid"]: r["lin_value"]
        for r in gridops.linear_interpolate(nodes, points, z=3).collect()
    }
    assert got and abs(got[1] - 46.9) < 1e-6 and abs(got[2] - 47.1) < 1e-6


def test_delaunay_cocircular_grid_no_gaps():
    # a regular grid is the fully-degenerate case (every 2x2 quad
    # cocircular) AND the shape raster-derived point clouds take: the
    # triangulation must still tile the hull with no interpolation gaps
    from gdal_scripts_spark.gridops import np_delaunay, np_tin_interpolate
    gx, gy = np.meshgrid(np.arange(8, dtype=float), np.arange(8, dtype=float))
    pts = np.column_stack([gx.ravel(), gy.ravel()])
    vals = 2.0 + 0.3 * pts[:, 0] + 0.7 * pts[:, 1]
    assert len(np_delaunay(pts)) == 2 * 49  # exact tiling of 7x7 cells
    rng = np.random.default_rng(0)
    qx, qy = rng.uniform(0.5, 6.5, 300), rng.uniform(0.5, 6.5, 300)
    got = np_tin_interpolate(pts, vals, qx, qy)
    assert not np.isnan(got).any()
    assert np.allclose(got, 2.0 + 0.3 * qx + 0.7 * qy, atol=1e-9)


def test_isoband_regions_hand_case(spark):
    from gdal_scripts_spark import codecs
    import pandas as pd
    # band 1 (v<10): two diagonal corners -> 2 regions of 1 px each;
    # band 2 (10<=v<20): the 4-connected remainder -> 1 region of 7 px
    img = np.array([
        [5, 15, 15],
        [15, 15, 15],
        [15, 15, 5],
    ], dtype=np.uint8)
    pdf = pd.DataFrame([{"image_id": "t0", "bytes": codecs.encode(img, "pgm"),
                         "fmt": "pgm"}])
    df = spark.createDataFrame(pdf, "image_id string, bytes binary, fmt string")
    got = {
        (r["image_id"], r["band"]): (r["n_regions"], r["n_pixels"])
        for r in contour.isoband_regions(df, interval=10.0, base=0.0).collect()
    }
    assert got == {("t0", 1): (2, 2), ("t0", 2): (1, 7)}

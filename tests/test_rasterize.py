"""Rasterize: vectorized even-odd burn vs the independent scanline oracle."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_scripts_spark import fixtures, rasterize


@pytest.fixture(scope="module")
def pack():
    return fixtures.polygons_pack(p=8)


def test_counts_match_scanline_oracle(spark, pack):
    z = 8
    got = {
        (r["poly_id"], r["tx"], r["ty"]): r["burned"]
        for r in rasterize.rasterize_counts(pack, spark, z=z).collect()
    }
    exp = {(p, tx, ty): c for p, tx, ty, c in rasterize.np_rasterize_counts(pack, z)}
    assert len(exp) > 0
    assert got == exp


def test_total_burned_tracks_area(spark, pack):
    # total burned pixels should be positive for every polygon at z=8 when
    # radius >= 0.2 deg (pixel ~0.006 deg)
    z = 8
    rows = rasterize.rasterize_counts(pack, spark, z=z).collect()
    per_poly: dict[int, int] = {}
    for r in rows:
        per_poly[r["poly_id"]] = per_poly.get(r["poly_id"], 0) + r["burned"]
    assert set(per_poly) == set(int(x) for x in pack.poly_ids)
    # holes reduce burn: polygons with 2 rings burn less than their exterior-only area
    for p in range(pack.n_polys):
        assert per_poly[int(pack.poly_ids[p])] > 0


def test_rasterize_tiles_merge_algs(spark):
    import gdal_scripts_spark.geom as geom

    sq1 = np.array([(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)])
    sq2 = np.array([(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5)])
    pk = geom.PolygonPack.from_rings([(1, [sq1]), (2, [sq2])])
    z = 8
    rep = rasterize.rasterize_tiles(pk, spark, z=z, merge_alg="replace").collect()
    add = rasterize.rasterize_tiles(pk, spark, z=z, merge_alg="add").collect()
    rep_m = {(r["tx"], r["ty"]): np.frombuffer(r["tile_bytes"], np.int32).reshape(256, 256) for r in rep}
    add_m = {(r["tx"], r["ty"]): np.frombuffer(r["tile_bytes"], np.int32).reshape(256, 256) for r in add}
    vals_rep = set(np.unique(np.concatenate([m.ravel() for m in rep_m.values()])).tolist())
    vals_add = set(np.unique(np.concatenate([m.ravel() for m in add_m.values()])).tolist())
    assert vals_rep <= {0, 1, 2}
    assert 3 in vals_add  # overlap region sums 1+2
    # replace: overlap must be 2 (higher poly_id wins)
    total_rep = sum((m == 2).sum() for m in rep_m.values())
    total_add3 = sum((m == 3).sum() for m in add_m.values())
    assert total_rep >= total_add3 > 0


# ---------------------------------------------------------------------------
# ALL_TOUCHED
# ---------------------------------------------------------------------------

def test_touched_mask_rect_closed_form():
    from gdal_scripts_spark.rasterize import np_touched_mask
    uv = np.array([[3.3, 2.7], [17.8, 2.7], [17.8, 9.2], [3.3, 9.2]])
    m = np_touched_mask([uv], h=32, w=32)
    # touched cells of an axis-aligned rect = full floor-index ranges
    assert m.sum() == (17 - 3 + 1) * (9 - 2 + 1)
    assert m[2:10, 3:18].all() and m.sum() == m[2:10, 3:18].sum()


def test_touched_mask_superset_of_center_fill():
    from gdal_scripts_spark import geom
    from gdal_scripts_spark.rasterize import np_touched_mask
    rng = np.random.default_rng(9)
    for _ in range(10):
        # random convex polygon (hull of random points) inside a 24x24 grid
        pts = rng.uniform(2, 22, size=(8, 2))
        c = pts.mean(axis=0)
        ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
        hull = pts[np.argsort(ang)]
        touched = np_touched_mask([hull], h=24, w=24)
        ii = np.tile(np.arange(24, dtype=float) + 0.5, 24)
        jj = np.repeat(np.arange(24, dtype=float) + 0.5, 24)
        center = geom.pip_even_odd(ii, jj, [hull]).reshape(24, 24)
        assert (touched | center == touched).all()  # superset
        # dense boundary supersampling never finds a cell the kernel missed
        for a, b in zip(hull, np.roll(hull, -1, axis=0)):
            t = np.linspace(0.0, 1.0, 4001)
            xs = a[0] + t * (b[0] - a[0])
            ys = a[1] + t * (b[1] - a[1])
            iu = np.clip(np.floor(xs).astype(int), 0, 23)
            iv = np.clip(np.floor(ys).astype(int), 0, 23)
            assert touched[iv, iu].all()

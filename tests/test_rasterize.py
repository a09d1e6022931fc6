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

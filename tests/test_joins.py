"""Spatial join paths (broadcast PiP, cell-keyed equi-join, salted) must all
match the sequential numpy oracle exactly (BASELINE north_star: join result
rows exact)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import fixtures, geom, joins

N_IMG = 400
N_POLY = 25


@pytest.fixture(scope="module")
def world(spark):
    images = fixtures.images_spark(spark, n=N_IMG).persist()
    images.count()
    pack = fixtures.polygons_pack(p=N_POLY)
    pdf = fixtures.make_images_pdf(N_IMG)
    oracle_pairs = {
        (pdf["image_id"].iloc[i], pid)
        for i, pid in geom.np_pip_pairs(
            pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), pack
        )
    }
    return images, pack, oracle_pairs


def _collect_pairs(df):
    return {(r["image_id"], r["poly_id"]) for r in df.collect()}


def test_broadcast_join_matches_oracle(world):
    images, pack, oracle = world
    got = _collect_pairs(joins.spatial_join_broadcast(images, pack))
    assert len(oracle) > 20  # fixture really produces hits
    assert got == oracle


def test_cell_join_matches_oracle(world):
    images, pack, oracle = world
    got = _collect_pairs(joins.spatial_join_cells(images, pack, z=8))
    assert got == oracle


def test_cell_join_salted_matches_oracle(world):
    images, pack, oracle = world
    got = _collect_pairs(
        joins.spatial_join_cells(
            images, pack, z=8, salt=True, hot_cell_threshold=5, n_salts=4,
            force_shuffle_join=True,
        )
    )
    assert got == oracle


def test_semi_anti_partition(world):
    images, pack, oracle = world
    inside_ids = {i for i, _ in oracle}
    semi = {r["image_id"] for r in joins.spatial_semi_join(images, pack).collect()}
    anti = {r["image_id"] for r in joins.spatial_anti_join(images, pack).collect()}
    assert semi == inside_ids
    assert semi | anti == {f"img{i:08d}" for i in range(N_IMG)}
    assert semi & anti == set()


def test_polygon_cover_is_conservative(world):
    _, pack, _ = world
    cover = joins.polygon_cover_cells(pack, z=8)
    # every polygon appears, and the cover contains the cell of its centroid
    pids = {p for p, _ in cover}
    assert pids == set(int(x) for x in pack.poly_ids)
    from gdal_scripts_spark import cells as C

    for p in range(pack.n_polys):
        cx = (pack.bbox[p, 0] + pack.bbox[p, 2]) / 2
        cy = (pack.bbox[p, 1] + pack.bbox[p, 3]) / 2
        c = int(C.np_cell_id(np.array([cx]), np.array([cy]), 8)[0])
        assert (int(pack.poly_ids[p]), c) in set(cover)


def test_no_python_udf_in_cell_key_stage(world):
    images, _, _ = world
    plan = joins.with_cell(images, 8)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_native_join_matches_oracle(world):
    images, pack, oracle = world
    got = _collect_pairs(joins.spatial_join_native(images, pack, z=8))
    assert got == oracle


def test_cell_join_native_refine_matches_oracle(world):
    images, pack, oracle = world
    got = _collect_pairs(
        joins.spatial_join_cells(
            images, pack, z=8, salt=True, hot_cell_threshold=5, n_salts=4,
            refine="native",
        )
    )
    assert got == oracle


def test_native_join_plan_has_no_python_stage(world):
    """The native path's contract: zero Python workers in the plan and a
    broadcast polygon side. (It is NOT the fast path — interpreted HOF
    evaluation measured ~20x slower than the Arrow refine,
    BENCH/pip_native_ab_r3.json — but the plan shape must hold.)"""
    images, pack, _ = world
    plan = (
        joins.spatial_join_native(images, pack, z=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow",
                   "FlatMapGroupsInPandas", "MapInPandas"):
        assert marker not in plan
    assert "BroadcastHashJoin" in plan


def test_native_join_holed_polygon_parity():
    """Even-odd fold over all rings: a point in the hole is OUTSIDE, a point
    in the annulus is inside — checked against the numpy kernel on a
    constructed donut (not just the random fixtures)."""
    from gdal_scripts_spark.session import get_spark

    spark = get_spark()
    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    hole = np.array([[3.0, 3.0], [3.0, 7.0], [7.0, 7.0], [7.0, 3.0]])
    pack = geom.PolygonPack.from_rings([(7, [outer, hole])])
    pts = spark.createDataFrame(
        [("in_annulus", 1.5, 5.0), ("in_hole", 5.0, 5.0), ("outside", 11.0, 5.0)],
        schema="image_id string, lon double, lat double",
    )
    got = _collect_pairs(joins.spatial_join_native(pts, pack, z=8))
    assert got == {("in_annulus", 7)}

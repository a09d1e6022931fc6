"""Geometry kernels: shoelace, WKT canonicalization, even-odd PiP (incl.
holes), rect clip; hypothesis property tests (PiP ray-cast vs winding)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_scripts_spark import fixtures, geom

SQUARE = np.array([(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)])
HOLE = np.array([(1.0, 1.0), (1.0, 3.0), (3.0, 3.0), (3.0, 1.0)])  # CW


def test_shoelace_and_area():
    assert geom.shoelace_area(SQUARE) == 16.0  # CCW positive
    assert geom.shoelace_area(SQUARE[::-1]) == -16.0
    assert geom.polygon_area([SQUARE, HOLE]) == 16.0 - 4.0


def test_centroid():
    cx, cy = geom.ring_centroid(SQUARE)
    assert (cx, cy) == (2.0, 2.0)


def test_wkt_canonical():
    w = geom.polygon_wkt([SQUARE[::-1], HOLE[::-1]])  # wrong orientations in
    assert w.startswith("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)")
    # hole must come out CW ((1,1)→(1,3)→(3,3)→(3,1) is clockwise)
    hole_part = w.split("), (")[1].rstrip(")")
    pts = [tuple(map(float, p.split())) for p in hole_part.split(", ")]
    assert pts[0] == pts[-1]  # closed
    xs = np.array([p[0] for p in pts[:-1]])
    ys = np.array([p[1] for p in pts[:-1]])
    assert geom.shoelace_area(np.column_stack([xs, ys])) < 0  # CW


def test_pip_square_with_hole():
    px = np.array([2.0, 0.5, 2.0, 5.0, 2.0])
    py = np.array([2.0, 0.5, 1.5, 2.0, 3.5])
    got = geom.pip_even_odd(px, py, [SQUARE, HOLE])
    #       in-hole  in      edge-ish in    out     in
    assert got.tolist() == [False, True, False, False, True]
    # wait: (2,1.5) is inside hole? hole is y in [1,3] → yes → False
    # recompute expectations explicitly:
    exp = [False, True, False, False, True]
    assert got.tolist() == exp


def test_pip_matches_matplotlib_free_winding():
    # compare even-odd ray cast against an independent winding-number
    # implementation on simple (non-self-intersecting) polygons
    rng = np.random.default_rng(11)

    def winding_inside(px, py, ring):
        r = ring
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        wn = np.zeros(px.shape, dtype=np.int64)
        for i in range(len(r)):
            up = (y1[i] <= py) & (y2[i] > py)
            dn = (y1[i] > py) & (y2[i] <= py)
            cross = (x2[i] - x1[i]) * (py - y1[i]) - (px - x1[i]) * (y2[i] - y1[i])
            wn += np.where(up & (cross > 0), 1, 0)
            wn -= np.where(dn & (cross < 0), 1, 0)
        return wn != 0

    for trial in range(20):
        k = int(rng.integers(3, 12))
        ang = np.sort(rng.uniform(0, 2 * np.pi, k))
        rad = rng.uniform(0.5, 2.0, k)
        ring = np.column_stack([rad * np.cos(ang), rad * np.sin(ang)])  # star-convex → simple
        px = rng.uniform(-2.5, 2.5, 200)
        py = rng.uniform(-2.5, 2.5, 200)
        assert np.array_equal(
            geom.pip_even_odd(px, py, [ring]), winding_inside(px, py, ring)
        ), trial


def test_pack_and_batch_vs_oracle():
    pack = fixtures.polygons_pack(p=25)
    rng = np.random.default_rng(4)
    # sample around polygon bboxes to get real hits
    px = np.concatenate(
        [rng.uniform(b[0] - 1, b[2] + 1, 40) for b in pack.bbox]
    )
    py = np.concatenate(
        [rng.uniform(b[1] - 1, b[3] + 1, 40) for b in pack.bbox]
    )
    oracle = set(geom.np_pip_pairs(px, py, pack))
    assert len(oracle) > 50  # fixture actually exercises hits
    idx, pid = geom.pip_batch(px, py, pack)
    got = set(zip(idx.tolist(), pid.tolist()))
    assert got == oracle


def test_clip_ring_rect():
    clipped = geom.clip_ring_rect(SQUARE, 1, 1, 3, 3)
    assert abs(abs(geom.shoelace_area(clipped)) - 4.0) < 1e-12
    # fully inside
    inner = geom.clip_ring_rect(HOLE, -10, -10, 10, 10)
    assert abs(abs(geom.shoelace_area(inner)) - 4.0) < 1e-12
    # fully outside
    out = geom.clip_ring_rect(SQUARE, 10, 10, 20, 20)
    assert len(out) == 0


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 100000))
def test_clip_area_never_grows(seed):
    rng = np.random.default_rng(seed)
    k = int(rng.integers(3, 10))
    ang = np.sort(rng.uniform(0, 2 * np.pi, k))
    ring = np.column_stack([2 * np.cos(ang), 2 * np.sin(ang)])
    a0 = abs(geom.shoelace_area(ring))
    box = sorted(rng.uniform(-2.5, 2.5, 2))
    boy = sorted(rng.uniform(-2.5, 2.5, 2))
    c = geom.clip_ring_rect(ring, box[0], boy[0], box[1], boy[1])
    a1 = abs(geom.shoelace_area(c)) if len(c) >= 3 else 0.0
    assert a1 <= a0 + 1e-9
    assert a1 <= (box[1] - box[0]) * (boy[1] - boy[0]) + 1e-9

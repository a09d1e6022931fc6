"""LineString kernels (lines.py): closed-form + sampling oracles, and a
plan check that every kernel stays JVM-side (pure Column, no Python UDF)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import lines


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [{"x": float(x), "y": float(y)} for (x, y) in pts])
         for i, pts in enumerate(rows)],
        schema="line_id long, pts array<struct<x:double,y:double>>",
    )


def test_length_and_centroid_closed_form(spark):
    # right angle: (0,0)->(3,0)->(3,4): length 7, centroid
    # (3*1.5 + 4*3)/7 = 2.357142857, (3*0 + 4*2)/7 = 1.142857142
    df = _df(spark, [[(0, 0), (3, 0), (3, 4)]])
    cx, cy = lines.centroid_cols(F.col("pts"))
    r = df.select(
        lines.length_col(F.col("pts")).alias("ln"),
        cx.alias("cx"), cy.alias("cy"),
    ).collect()[0]
    assert abs(r.ln - 7.0) < 1e-12
    assert abs(r.cx - (3 * 1.5 + 4 * 3) / 7) < 1e-12
    assert abs(r.cy - (4 * 2) / 7) < 1e-12


def test_bbox_cols(spark):
    df = _df(spark, [[(2, 9), (-1, 4), (5, 7)]])
    x0, y0, x1, y1 = lines.bbox_cols(F.col("pts"))
    r = df.select(x0.alias("a"), y0.alias("b"), x1.alias("c"), y1.alias("d")).collect()[0]
    assert (r.a, r.b, r.c, r.d) == (-1.0, 4.0, 5.0, 9.0)


def test_clip_length_rect_cases(spark):
    rect = (0.0, 0.0, 10.0, 10.0)
    cases = [
        ([(2, 2), (8, 2)], 6.0),                 # fully inside
        ([(-5, 5), (15, 5)], 10.0),              # crossing both walls
        ([(-5, -5), (-1, -1)], 0.0),             # fully outside
        ([(5, -5), (5, 15)], 10.0),              # vertical through (dx=0)
        ([(-2, 5), (5, 5), (5, 20)], 5.0 + 5.0),  # enter + exit on bend
        ([(0, 0), (10, 10)], np.sqrt(200.0)),    # corner-to-corner diagonal
    ]
    df = _df(spark, [pts for pts, _ in cases])
    out = {
        r.line_id: r.c
        for r in df.select(
            "line_id", lines.clip_length_rect(F.col("pts"), *rect).alias("c")
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert abs(out[i] - want) < 1e-9, (i, out[i], want)


def test_clip_length_matches_sampling_oracle(spark):
    """Independent oracle: dense point sampling along random polylines."""
    rng = np.random.default_rng(5)
    rows, wants = [], []
    X0, Y0, X1, Y1 = 20.0, 10.0, 70.0, 60.0
    for _ in range(25):
        k = int(rng.integers(2, 6))
        pts = rng.uniform(-10, 100, (k, 2))
        rows.append([tuple(p) for p in pts])
        total = 0.0
        N = 400_000 // (k - 1)
        for a, b in zip(pts[:-1], pts[1:]):
            t = (np.arange(N) + 0.5) / N
            sx = a[0] + t * (b[0] - a[0])
            sy = a[1] + t * (b[1] - a[1])
            frac = ((sx >= X0) & (sx <= X1) & (sy >= Y0) & (sy <= Y1)).mean()
            total += np.hypot(*(b - a)) * frac
        wants.append(total)
    df = _df(spark, rows)
    out = {
        r.line_id: r.c
        for r in df.select(
            "line_id",
            lines.clip_length_rect(F.col("pts"), X0, Y0, X1, Y1).alias("c"),
        ).collect()
    }
    for i, want in enumerate(wants):
        assert abs(out[i] - want) < 1e-2, (i, out[i], want)


def test_lines_kernels_stay_jvm_side(spark):
    df = _df(spark, [[(0, 0), (3, 0), (3, 4)]])
    cx, cy = lines.centroid_cols(F.col("pts"))
    plan = df.select(
        lines.length_col(F.col("pts")).alias("ln"), cx.alias("cx"),
        lines.clip_length_rect(F.col("pts"), 0, 0, 1, 1).alias("cl"),
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bbox_join_matches_bruteforce(spark):
    rng = np.random.default_rng(9)
    rows = []
    for _ in range(40):
        k = int(rng.integers(2, 5))
        rows.append([tuple(p) for p in rng.uniform(0, 90, (k, 2))])
    ldf = _df(spark, rows)
    rects = [(j, *sorted(map(float, rng.uniform(0, 90, 2))),
              *sorted(map(float, rng.uniform(0, 90, 2)))) for j in range(15)]
    rdf = spark.createDataFrame(
        [(j, a, c, b, d) for (j, a, b, c, d) in rects],
        schema="id_a long, rx0 double, ry0 double, rx1 double, ry1 double",
    )
    got = {(r.line_id, r.id_a)
           for r in lines.bbox_join(ldf, rdf, bucket=16.0).collect()}
    want = set()
    for i, pts in enumerate(rows):
        arr = np.array(pts)
        lx0, ly0 = arr.min(axis=0)
        lx1, ly1 = arr.max(axis=0)
        for r in rdf.collect():
            if lx0 <= r.rx1 and r.rx0 <= lx1 and ly0 <= r.ry1 and r.ry0 <= ly1:
                want.add((i, r.id_a))
    assert got == want


# ---------------------------------------------------------------------------
# dda_burn_cols — integer-DDA line rasterization (gdal_rasterize line burn)
# ---------------------------------------------------------------------------

def _burn(spark, pts):
    row = spark.createDataFrame(
        pd.DataFrame({"pts": [pts]}),
        schema="pts array<struct<x double, y double>>",
    ).select(
        F.array_distinct(lines.dda_burn_cols(F.col("pts"))).alias("px")
    ).collect()[0]
    return sorted((p["px"], p["py"]) for p in row["px"])


def test_dda_horizontal_segment(spark):
    got = _burn(spark, [(0.2, 0.2), (3.8, 0.2)])
    assert got == [(0, 0), (1, 0), (2, 0), (3, 0)]


def test_dda_steep_segment_rounds_half_up(spark):
    # p0=(0,0), p1=(2,5): n=5, px(t) = floor(2t/5 + 0.5) -> 0,0,1,1,2,2
    got = _burn(spark, [(0.0, 0.0), (2.5, 5.5)])
    assert got == [(0, 0), (0, 1), (1, 2), (1, 3), (2, 4), (2, 5)]


def test_dda_degenerate_segment_single_pixel(spark):
    got = _burn(spark, [(4.1, 7.9), (4.9, 7.2)])
    assert got == [(4, 7)]


def test_dda_polyline_joint_deduplicated(spark):
    # two segments sharing vertex (2.5, 0.5): joint pixel (2, 0) appears in
    # both segment burns; array_distinct keeps one
    got = _burn(spark, [(0.5, 0.5), (2.5, 0.5), (4.5, 0.5)])
    assert got == [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0)]


def test_dda_negative_coords(spark):
    got = _burn(spark, [(-2.5, -0.5), (0.5, 0.5)])
    # p0 = (-3, -1), p1 = (0, 0): n=3, px=-3..0, py=floor(t/3+.5): -1,-1,0,0
    assert got == [(-3, -1), (-2, -1), (-1, 0), (0, 0)]

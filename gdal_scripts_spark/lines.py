"""LineString features end-to-end (SURVEY.md §1.1 geometry hierarchy —
``ogr/ogrgeometry.cpp : OGRLineString``, the most common OGR geometry after
polygons; ogr2ogr moves lines constantly).

Data model: a polyline is ``array<struct<x:double, y:double>>`` (ordered
vertices, 2+ points) in a ``pts`` column — same struct-array convention as
the polygon ``rings`` column in overlay.py, so the two compose.

Everything here is PURE Column math (JVM-side, whole-stage codegen; the F5
scalar-function discipline): length/centroid/bbox via ``zip_with`` over
consecutive-vertex pairs, and the Liang–Barsky axis-rect clip as a
closed-form parametric-interval expression per segment — no Python UDFs
anywhere. Reference semantics: ``OGRLineString::get_Length / Value``
(length), ``OGRGeometry::Centroid`` for linear geometry (length-weighted
midpoint average), ``OGRLineString::getEnvelope``, and ogr2ogr
``-clipsrc`` (``apps/ogr2ogr_lib.cpp ≈L1500``) for the clip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _segments(pts: Column) -> Column:
    """array of segment structs (x1,y1,x2,y2) over consecutive vertices."""
    n = F.size(pts)
    return F.zip_with(
        F.slice(pts, F.lit(1), n - 1),
        F.slice(pts, F.lit(2), n - 1),
        lambda a, b: F.struct(
            a["x"].alias("x1"), a["y"].alias("y1"),
            b["x"].alias("x2"), b["y"].alias("y2"),
        ),
    )


def _seg_len(s: Column) -> Column:
    return F.sqrt(
        (s["x2"] - s["x1"]) * (s["x2"] - s["x1"])
        + (s["y2"] - s["y1"]) * (s["y2"] - s["y1"])
    )


def dda_burn_cols(pts: Column) -> Column:
    """Pixels burned by rasterizing the polyline with an integer DDA —
    ``array<struct<px:int, py:int>>`` (with joint/step duplicates; wrap in
    ``array_distinct`` for the per-feature burn set).

    Semantics mirror gdal_rasterize's line burn (``alg/llrasterize.cpp :
    GDALdllImageLine``): snap each vertex to its containing cell with
    ``floor``, then step ``n = max(|dpx|, |dpy|)`` times along the segment,
    rounding the interpolated cell via ``floor(v + 0.5)`` — spelled that way
    (not ``round``) so DuckDB oracles reproduce the exact half-step ties.
    PURE Column (sequence/transform/flatten HOFs, whole-stage codegen): the
    burn explodes ~n rows per segment with no shuffle and no Python.
    """
    def seg_pixels(s: Column) -> Column:
        px0, py0 = F.floor(s["x1"]), F.floor(s["y1"])
        px1, py1 = F.floor(s["x2"]), F.floor(s["y2"])
        dx, dy = px1 - px0, py1 - py0
        n = F.greatest(F.abs(dx), F.abs(dy))
        nd = F.greatest(n, F.lit(1)).cast("double")
        return F.transform(
            F.sequence(F.lit(0), n.cast("int")),
            lambda t: F.struct(
                (px0 + F.floor(t.cast("double") * dx.cast("double") / nd
                               + F.lit(0.5))).cast("int").alias("px"),
                (py0 + F.floor(t.cast("double") * dy.cast("double") / nd
                               + F.lit(0.5))).cast("int").alias("py"),
            ),
        )

    return F.flatten(F.transform(_segments(pts), seg_pixels))


def length_col(pts: Column) -> Column:
    """Polyline length (OGRLineString::get_Length)."""
    return F.aggregate(
        _segments(pts), F.lit(0.0), lambda acc, s: acc + _seg_len(s)
    )


def centroid_cols(pts: Column) -> tuple[Column, Column]:
    """Length-weighted centroid of a polyline (OGRGeometry::Centroid for
    dimension-1 geometry): sum(seg_len * midpoint) / total_len."""
    segs = _segments(pts)
    total = F.aggregate(segs, F.lit(0.0), lambda acc, s: acc + _seg_len(s))
    wx = F.aggregate(
        segs, F.lit(0.0),
        lambda acc, s: acc + _seg_len(s) * (s["x1"] + s["x2"]) / 2.0,
    )
    wy = F.aggregate(
        segs, F.lit(0.0),
        lambda acc, s: acc + _seg_len(s) * (s["y1"] + s["y2"]) / 2.0,
    )
    return wx / total, wy / total


def bbox_cols(pts: Column) -> tuple[Column, Column, Column, Column]:
    """(xmin, ymin, xmax, ymax) — OGRLineString::getEnvelope."""
    xs = F.transform(pts, lambda p: p["x"])
    ys = F.transform(pts, lambda p: p["y"])
    return F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys)


def clip_length_rect(pts: Column, x0: float, y0: float,
                     x1: float, y1: float) -> Column:
    """Total polyline length inside the axis rect [x0,x1]x[y0,y1] —
    Liang–Barsky parametric clip, closed form per segment:
    t_enter = max(0, entering ts), t_exit = min(1, leaving ts), clipped
    length = seg_len * max(0, t_exit - t_enter). Degenerate axis-parallel
    segments (dx==0 or dy==0) use an inside/outside band test for that
    axis (the p=0 case of the algorithm)."""
    def clipped(s: Column) -> Column:
        dx = s["x2"] - s["x1"]
        dy = s["y2"] - s["y1"]
        # per axis: parametric interval of t where the segment is inside
        # the slab; for zero delta the interval is (-inf, inf) if inside
        # the slab else empty (encoded as lo=1, hi=0)
        def slab(p1, d, lo_b, hi_b):
            ta = (F.lit(lo_b) - p1) / d
            tb = (F.lit(hi_b) - p1) / d
            lo = F.least(ta, tb)
            hi = F.greatest(ta, tb)
            inside = (p1 >= lo_b) & (p1 <= hi_b)
            return (
                F.when(d != 0, lo).when(inside, F.lit(float("-inf")))
                .otherwise(F.lit(1.0)),
                F.when(d != 0, hi).when(inside, F.lit(float("inf")))
                .otherwise(F.lit(0.0)),
            )

        xlo, xhi = slab(s["x1"], dx, x0, x1)
        ylo, yhi = slab(s["y1"], dy, y0, y1)
        t_enter = F.greatest(F.lit(0.0), xlo, ylo)
        t_exit = F.least(F.lit(1.0), xhi, yhi)
        return _seg_len(s) * F.greatest(F.lit(0.0), t_exit - t_enter)

    return F.aggregate(_segments(pts), F.lit(0.0),
                       lambda acc, s: acc + clipped(s))


def bbox_join(lines: DataFrame, rects: DataFrame, id_line: str = "line_id",
              id_rect: str = "id_a", bucket: float = 16.0) -> DataFrame:
    """Line-bbox x rect-bbox overlap join via the cell-keyed equi-join shape
    (J2 at envelope granularity): both sides explode their envelope to
    covering grid buckets, pairs equi-join on the bucket key (native hash
    join, AQE-skew-safe), the exact interval test refines, dedupe on ids
    only. ``rects`` carries (id_rect, rx0, ry0, rx1, ry1)."""
    x0, y0, x1, y1 = bbox_cols(F.col("pts"))
    lb = (
        lines.select(F.col(id_line), x0.alias("lx0"), y0.alias("ly0"),
                     x1.alias("lx1"), y1.alias("ly1"))
        .withColumn("_bx", F.explode(F.sequence(
            F.floor(F.col("lx0") / bucket), F.floor(F.col("lx1") / bucket))))
        .withColumn("_by", F.explode(F.sequence(
            F.floor(F.col("ly0") / bucket), F.floor(F.col("ly1") / bucket))))
    )
    rb = (
        rects
        .withColumn("_bx", F.explode(F.sequence(
            F.floor(F.col("rx0") / bucket), F.floor(F.col("rx1") / bucket))))
        .withColumn("_by", F.explode(F.sequence(
            F.floor(F.col("ry0") / bucket), F.floor(F.col("ry1") / bucket))))
    )
    return (
        lb.join(rb, ["_bx", "_by"])
        .filter(
            (F.col("lx0") <= F.col("rx1")) & (F.col("rx0") <= F.col("lx1"))
            & (F.col("ly0") <= F.col("ry1")) & (F.col("ry0") <= F.col("ly1"))
        )
        .select(id_line, id_rect)
        .dropDuplicates([id_line, id_rect])
    )

"""WKT / WKB / GeoJSONSeq interop — roundtrips, spec pins, numpy oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import formats, geom


SAMPLES = [
    "POINT (30 10)",
    "LINESTRING (30 10, 10 30, 40 40)",
    "POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))",
    # holed polygon
    "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
    "MULTIPOINT ((10 40), (40 30), (20 20), (30 10))",
    "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
    # multi-part with a hole in the second part
    (
        "MULTIPOLYGON (((40 40, 20 45, 45 30, 40 40)), "
        "((20 35, 10 30, 10 10, 30 5, 45 20, 20 35), "
        "(30 20, 20 15, 20 25, 30 20)))"
    ),
]


# ---------------------------------------------------------------------------
# python-level codec properties (exercised via the same functions the UDFs use)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("wkt", SAMPLES)
def test_wkt_roundtrip_text(wkt):
    kind, parts = formats.wkt_to_parts(wkt)
    out = formats.parts_to_wkt(kind, parts)
    # canonical formatting == input for these already-canonical samples
    assert out == wkt
    # struct-level fixpoint
    assert formats.wkt_to_parts(out) == (kind, parts)


@pytest.mark.parametrize("wkt", SAMPLES)
def test_wkb_roundtrip_bytes(wkt):
    kind, parts = formats.wkt_to_parts(wkt)
    buf = formats.parts_to_wkb(kind, parts)
    k2, p2 = formats.wkb_to_parts(buf)
    assert (k2, p2) == (kind, parts)
    # encode is a fixpoint too
    assert formats.parts_to_wkb(k2, p2) == buf


def test_wkb_spec_pins():
    """Byte-exact pins from the OGC 99-049 / ISO 13249-3 WKB layout."""
    buf = formats.parts_to_wkb("POINT", [[[(1.0, 2.0)]]])
    assert buf.hex() == (
        "0101000000" + "000000000000f03f" + "0000000000000040"
    )
    # LINESTRING (0 0, 1 1): 0x02, count 2, four doubles
    k, parts = formats.wkt_to_parts("LINESTRING (0 0, 1 1)")
    buf = formats.parts_to_wkb(k, parts)
    assert buf.hex().startswith("010200000002000000")
    assert len(buf) == 1 + 4 + 4 + 4 * 8
    # MULTIPOLYGON nests full WKB polygons (each with its own 0x01 0x03 head)
    k, parts = formats.wkt_to_parts(SAMPLES[-1])
    buf = formats.parts_to_wkb(k, parts)
    assert buf[:5].hex() == "0106000000"
    assert buf.count(bytes.fromhex("0103000000")) == 2


def test_multipoint_flat_spelling():
    a = formats.wkt_to_parts("MULTIPOINT ((1 2), (3 4))")
    b = formats.wkt_to_parts("MULTIPOINT (1 2, 3 4)")
    assert a == b


def test_malformed_wkt_raises():
    for bad in ["", "CIRCLE (1 2)", "POINT 1 2", "POLYGON ((1 2, 3))"]:
        with pytest.raises(ValueError):
            formats.wkt_to_parts(bad)


def test_wkb_errors():
    with pytest.raises(ValueError):
        formats.wkb_to_parts(b"\x00" + b"\x00" * 20)  # big-endian marker
    good = formats.parts_to_wkb("POINT", [[[(1.0, 2.0)]]])
    with pytest.raises(ValueError):
        formats.wkb_to_parts(good + b"\x00")  # trailing bytes


# ---------------------------------------------------------------------------
# Spark column pipeline: parse UDFs + pure-Column scalars vs numpy oracle
# ---------------------------------------------------------------------------


def _oracle_area(parts) -> float:
    total = 0.0
    for rings in parts:
        ext = abs(geom.shoelace_area(np.asarray(rings[0])))
        holes = sum(abs(geom.shoelace_area(np.asarray(r))) for r in rings[1:])
        total += ext - holes
    return total


def _oracle_length(parts) -> float:
    total = 0.0
    for rings in parts:
        for r in rings:
            a = np.asarray(r, dtype=np.float64)
            total += float(np.sqrt(((a[1:] - a[:-1]) ** 2).sum(axis=1)).sum())
    return total


def test_spark_parse_and_scalars(spark):  # noqa: F811
    df = spark.createDataFrame(
        pd.DataFrame({"wid": range(len(SAMPLES)), "wkt": SAMPLES}),
        schema="wid long, wkt string",
    )
    g = formats.wkt_parse(F.col("wkt"))
    out = (
        df.select(
            "wid",
            g.alias("geom"),
        )
        .select(
            "wid",
            formats.geom_area(F.col("geom")).alias("area"),
            formats.geom_length(F.col("geom")).alias("length"),
            formats.geom_num_parts(F.col("geom")).alias("nparts"),
            formats.geom_num_points(F.col("geom")).alias("npoints"),
            formats.geom_bbox(F.col("geom")).alias("bbox"),
            formats.wkt_format(F.col("geom")).alias("wkt_out"),
        )
        .orderBy("wid")
        .collect()
    )
    for row, wkt in zip(out, SAMPLES):
        kind, parts = formats.wkt_to_parts(wkt)
        assert row.wkt_out == wkt
        assert row.nparts == len(parts)
        assert row.npoints == sum(len(r) for p in parts for r in p)
        if kind in ("POLYGON", "MULTIPOLYGON"):
            assert row.area == pytest.approx(_oracle_area(parts), rel=1e-12)
        assert row.length == pytest.approx(_oracle_length(parts), rel=1e-12)
        flat = [pt for p in parts for r in p for pt in r]
        xs, ys = [p[0] for p in flat], [p[1] for p in flat]
        assert (row.bbox.minx, row.bbox.miny, row.bbox.maxx, row.bbox.maxy) == (
            min(xs), min(ys), max(xs), max(ys)
        )


def test_spark_scalars_stay_jvm_side(spark):  # noqa: F811
    """The scalar hot path must not contain a Python worker stage: plan over
    an already-materialized geometry struct shows no BatchEvalPython /
    ArrowEvalPython nodes."""
    df = spark.createDataFrame(
        pd.DataFrame({"wkt": SAMPLES}), schema="wkt string"
    ).select(formats.wkt_parse(F.col("wkt")).alias("geom"))
    df_cached = spark.createDataFrame(df.collect(), schema=df.schema)
    plan = (
        df_cached.select(
            formats.geom_area(F.col("geom")).alias("a"),
            formats.geom_length(F.col("geom")).alias("l"),
            formats.geom_bbox(F.col("geom")).alias("b"),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan[:1500]


def test_spark_wkb_column_roundtrip(spark):  # noqa: F811
    df = spark.createDataFrame(pd.DataFrame({"wkt": SAMPLES}), schema="wkt string")
    out = (
        df.select(
            "wkt",
            formats.wkt_format(
                formats.wkb_parse(formats.wkb_from_wkt(F.col("wkt")))
            ).alias("back"),
        )
        .collect()
    )
    for r in out:
        assert r.back == r.wkt


# ---------------------------------------------------------------------------
# GeoJSONSeq sink + source
# ---------------------------------------------------------------------------


def test_geojson_seq_roundtrip(spark, tmp_path):  # noqa: F811
    polys = [s for s in SAMPLES if s.startswith("POLYGON")]
    df = spark.createDataFrame(
        pd.DataFrame({"pid": range(len(polys)), "wkt": polys}),
        schema="pid long, wkt string",
    ).select("pid", formats.wkt_parse(F.col("wkt")).alias("geom"))

    path = str(tmp_path / "seq")
    formats.write_geojson_seq(df, path, "geom", ["pid"], kind="POLYGON")

    # line-level: every line is a valid RFC 7946 Feature
    lines = [
        r.value for r in spark.read.text(path).collect()
    ]
    assert len(lines) == len(polys)
    for line in lines:
        kind, parts, props = formats.parse_geojson_feature(line)
        assert kind == "POLYGON" and "pid" in props

    back = formats.read_geojson_seq(spark, path, "POLYGON", "pid bigint")
    got = {
        r.pid: r.wkt_out
        for r in back.select(
            "pid", formats.wkt_format(F.col("geom")).alias("wkt_out")
        ).collect()
    }
    assert got == {i: w for i, w in enumerate(polys)}


def test_geojson_writer_is_pure_column(spark):  # noqa: F811
    df = spark.createDataFrame(
        pd.DataFrame({"pid": [1], "wkt": [SAMPLES[2]]}), schema="pid long, wkt string"
    ).select("pid", formats.wkt_parse(F.col("wkt")).alias("geom"))
    df_cached = spark.createDataFrame(df.collect(), schema=df.schema)
    plan = (
        formats.to_geojson_features(df_cached, "geom", ["pid"], "POLYGON")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan[:1500]


# ---------------------------------------------------------------------------
# property-based roundtrips (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# WKB is byte-exact for any finite float64; WKT goes through %.10g text so
# coordinates are normalized to 10 significant digits first.
_finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e15, max_value=1e15
)
_pt = st.tuples(_finite, _finite)
_ring = st.lists(_pt, min_size=3, max_size=8).map(lambda r: r + [r[0]])
_poly_parts = st.lists(st.lists(_ring, min_size=1, max_size=3), min_size=1, max_size=3)
_line_parts = st.lists(
    st.lists(_pt, min_size=2, max_size=8).map(lambda p: [p]), min_size=1, max_size=3
)


def _g10(v: float) -> float:
    return float(f"{v:.10g}")


def _norm10(parts):
    return [
        [[(_g10(x), _g10(y)) for x, y in ring] for ring in part] for part in parts
    ]


@settings(max_examples=60, deadline=None)
@given(_poly_parts)
def test_hyp_wkb_polygon_roundtrip(parts):
    kind = "MULTIPOLYGON" if len(parts) > 1 else "POLYGON"
    buf = formats.parts_to_wkb(kind, parts)
    assert formats.wkb_to_parts(buf) == (kind, parts)


@settings(max_examples=60, deadline=None)
@given(_line_parts)
def test_hyp_wkb_line_roundtrip(parts):
    kind = "MULTILINESTRING" if len(parts) > 1 else "LINESTRING"
    buf = formats.parts_to_wkb(kind, parts)
    assert formats.wkb_to_parts(buf) == (kind, parts)


@settings(max_examples=60, deadline=None)
@given(_poly_parts)
def test_hyp_wkt_polygon_roundtrip(parts):
    parts = _norm10(parts)
    kind = "MULTIPOLYGON" if len(parts) > 1 else "POLYGON"
    wkt = formats.parts_to_wkt(kind, parts)
    k2, p2 = formats.wkt_to_parts(wkt)
    assert (k2, p2) == (kind, parts)
    # formatting is a fixpoint after one normalization pass
    assert formats.parts_to_wkt(k2, p2) == wkt


@settings(max_examples=60, deadline=None)
@given(st.lists(_pt, min_size=1, max_size=6))
def test_hyp_wkt_multipoint_roundtrip(pts):
    parts = [[[(_g10(x), _g10(y))]] for x, y in pts]
    kind = "MULTIPOINT" if len(parts) > 1 else "POINT"
    wkt = formats.parts_to_wkt(kind, parts)
    assert formats.wkt_to_parts(wkt) == (kind, parts)

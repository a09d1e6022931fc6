"""KMV distinct-count sketch (sketches.py) — estimator accuracy, the
exact-below-k contract, and merge-invariance of the partial combine."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import sketches


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "grp string, key long")


def test_kmv_exact_when_below_k(spark):
    # 40 distinct keys < k=64 -> the sketch IS the exact count
    df = _df(spark, [("a", i % 40) for i in range(400)])
    row = sketches.kmv_distinct(df, ["grp"], "key", k=64).collect()[0]
    assert row["est_distinct"] == 40
    assert row["n_kept"] == 40


def test_kmv_accuracy_and_python_reference(spark):
    # 5000 distinct keys at k=256: KMV std error ~ 1/sqrt(k-2) ~ 6.3%;
    # the md5 stream is fixed so the estimate is deterministic — assert the
    # exact value against an independent pure-Python reference AND a
    # generous 3-sigma accuracy band.
    n, k = 5000, 256
    df = _df(spark, [("a", i) for i in range(n)])
    row = sketches.kmv_distinct(df, ["grp"], "key", k=k).collect()[0]

    hs = sorted(hashlib.md5(str(i).encode()).hexdigest() for i in range(n))
    kth = int(hs[k - 1][:12], 16)
    want = int(round((k - 1) * float(16**12) / kth))
    assert row["est_distinct"] == want
    assert abs(row["est_distinct"] - n) / n < 3 / (k - 2) ** 0.5
    assert row["n_kept"] == k


def test_kmv_partial_combine_is_invariant(spark):
    # mergeable-sketch property: the Arrow per-partition top-k combine must
    # not change the estimate, for any partitioning
    rows = [(g, i * 7 + j) for g in ("a", "b") for i in range(300) for j in (0, 1)]
    df = _df(spark, rows)
    full = {
        (r["grp"], r["est_distinct"], r["n_kept"])
        for r in sketches.kmv_distinct(df, ["grp"], "key", k=32, partial=False).collect()
    }
    for parts in (1, 7):
        got = {
            (r["grp"], r["est_distinct"], r["n_kept"])
            for r in sketches.kmv_distinct(
                df.repartition(parts), ["grp"], "key", k=32, partial=True
            ).collect()
        }
        assert got == full, parts


def test_kmv_validation_and_plan(spark):
    df = _df(spark, [("a", 1)])
    with pytest.raises(ValueError, match="k >= 2"):
        sketches.kmv_distinct(df, ["grp"], "key", k=1)
    # the estimate path is Column arithmetic; the only Python node is the
    # Arrow-batched partial combine (MapInPandas), never row-Python
    plan = sketches.kmv_distinct(df, ["grp"], "key", k=8)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

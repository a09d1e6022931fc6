"""Manifest resume semantics: skip committed units, re-run changed inputs,
idempotent replay; streaming AvailableNow incremental ingest."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_scripts_spark import checkpoint, fixtures, streaming


def _transform(df):
    # simple per-unit transform preserving the unit column
    return df.select("bucket", "image_id", (F.length("caption")).alias("cap_len"))


@pytest.fixture()
def images(spark):
    return fixtures.images_spark(spark, n=120).withColumn(
        "bucket", F.pmod(F.xxhash64("image_id"), F.lit(6))
    ).select("bucket", "image_id", "caption", "lon", "lat").persist()


def test_resume_skips_committed_units(spark, images, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    m1 = checkpoint.resumable_run(
        images, "bucket", ["image_id", "caption"], _transform, out, man, run_id="r1"
    )
    assert m1["units_run"] == 6 and m1["units_total"] == 6
    n1 = spark.read.parquet(out).count()
    assert n1 == 120
    # immediate re-run: nothing pending
    m2 = checkpoint.resumable_run(
        images, "bucket", ["image_id", "caption"], _transform, out, man, run_id="r2"
    )
    assert m2["resumed"] is True and m2["units_run"] == 0
    assert spark.read.parquet(out).count() == 120


def test_changed_input_reruns_only_that_unit(spark, images, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    checkpoint.resumable_run(
        images, "bucket", ["image_id", "caption"], _transform, out, man, run_id="r1"
    )
    # mutate the caption of rows in exactly one bucket
    changed = images.withColumn(
        "caption",
        F.when(F.col("bucket") == 3, F.concat(F.col("caption"), F.lit("!"))).otherwise(
            F.col("caption")
        ),
    )
    m = checkpoint.resumable_run(
        changed, "bucket", ["image_id", "caption"], _transform, out, man, run_id="r3"
    )
    assert m["units_run"] == 1
    # output stays complete and reflects the overwrite (idempotent replay)
    res = spark.read.parquet(out)
    assert res.count() == 120
    bucket3 = res.filter(F.col("_unit") == "3").count()
    assert bucket3 == images.filter("bucket = 3").count()


def test_run_metrics_rollup(spark, images, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    checkpoint.resumable_run(
        images, "bucket", ["image_id"], _transform, out, man, run_id="rX"
    )
    m = {r["run_id"]: r for r in checkpoint.run_metrics(spark, man).collect()}
    assert m["rX"]["units"] == 6
    assert m["rX"]["rows_in"] == 120 and m["rX"]["rows_out"] == 120


def test_streaming_available_now_incremental(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pdf1 = fixtures.make_images_pdf(30, seed=1)
    spark.createDataFrame(pdf1, schema=fixtures.IMAGES_SCHEMA).write.parquet(
        str(src / "batch1")
    )
    streaming.stream_cell_encode(spark, str(src / "*"), out, ckpt, z=8)
    n1 = spark.read.parquet(out).count()
    assert n1 == 30
    # new files arrive; second drain processes ONLY them
    pdf2 = fixtures.make_images_pdf(20, seed=2)
    spark.createDataFrame(pdf2, schema=fixtures.IMAGES_SCHEMA).write.parquet(
        str(src / "batch2")
    )
    streaming.stream_cell_encode(spark, str(src / "*"), out, ckpt, z=8)
    res = spark.read.parquet(out)
    assert res.count() == 50
    # encoded columns are present and consistent with the batch path
    row = res.filter(F.col("image_id") == "img00000003").collect()[0]
    from gdal_scripts_spark import cells
    i = 3
    exp = int(cells.np_cell_id(np.array([row["lon"]]), np.array([row["lat"]]), 8)[0])
    assert row["cell"] == exp

"""gdalinfo/ogrinfo analogs: multi-band raster report + whole-layer summary."""

import numpy as np

from gdal_scripts_spark import codecs, info


def test_raster_info_rgb(spark):
    rgb = np.zeros((4, 5, 3), dtype=np.uint8)
    rgb[:, :, 0] = np.arange(20).reshape(4, 5)  # band 0 = 0..19
    rgb[:, :, 1] = 200
    df = spark.createDataFrame(
        [("a", codecs.encode(rgb, "ppm"), "ppm")],
        schema="image_id string, bytes binary, fmt string",
    )
    row = info.raster_info(df).collect()[0]
    assert (row["w"], row["h"], row["bands"], row["dtype"]) == (5, 4, 3, "uint8")
    assert (row["v_min"], row["v_max"], row["v_mean"]) == (0.0, 19.0, 9.5)
    assert row["checksum"] == codecs.gdal_checksum_band(rgb[:, :, 0])
    # band selection: stats move to the green band
    row_g = info.raster_info(df, band=1).collect()[0]
    assert (row_g["v_min"], row_g["v_max"]) == (200.0, 200.0)


def test_layer_info_whole_frame(spark):
    df = spark.createDataFrame(
        [(1, -10.0, 5.0), (2, 20.0, -3.0), (3, 0.0, 0.0)],
        schema="fid long, lon double, lat double",
    )
    row = info.layer_info(df).collect()[0]
    assert row["n_features"] == 3
    assert (row["xmin"], row["ymin"], row["xmax"], row["ymax"]) == (
        -10.0, -3.0, 20.0, 5.0,
    )

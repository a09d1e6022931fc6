"""spark-submit CLI (cli.py): every job path drivable locally."""

from __future__ import annotations

import pytest

from gdal_scripts_spark import cli, fixtures


def test_cli_query_job(spark, tmp_path, capsys):
    out = str(tmp_path / "q")
    rc = cli.main(["query", "--query", "distinct_vals",
                   "--sf-dir", "/root/testdata/sf0.001", "--output", out])
    assert rc == 0
    assert spark.read.parquet(out).count() == 5


def test_cli_tile_cut_and_sink(spark, tmp_path):
    src = str(tmp_path / "imgs")
    fixtures.images_spark(spark, n=8).write.parquet(src)
    out = str(tmp_path / "tiles")
    assert cli.main(["tile-cut", "--input", src, "--z", "11",
                     "--output", out]) == 0
    n = spark.read.parquet(out).count()
    assert n > 0

    sink_out = str(tmp_path / "sink")
    man = str(tmp_path / "manifest")
    assert cli.main(["tile-sink", "--input", src, "--output", sink_out,
                     "--manifest", man, "--z", "11", "--n-units", "2"]) == 0
    assert spark.read.parquet(sink_out).count() == n


def test_cli_assign_and_stream(spark, tmp_path):
    src = str(tmp_path / "imgs")
    fixtures.images_spark(spark, n=6).write.parquet(src)
    out = str(tmp_path / "assign")
    assert cli.main(["assign", "--input", src, "--z", "9",
                     "--output", out]) == 0
    df = spark.read.parquet(out)
    assert df.count() == 6 and "quadkey" in df.columns

    sout, ck = str(tmp_path / "sout"), str(tmp_path / "ck")
    assert cli.main(["stream", "--input", src, "--output", sout,
                     "--checkpoint", ck, "--z", "8"]) == 0
    assert spark.read.parquet(sout).count() == 6


def test_cli_requires_args():
    with pytest.raises(SystemExit):
        cli.main(["query"])         # missing --query
    with pytest.raises(SystemExit):
        cli.main(["tile-sink"])     # missing paths

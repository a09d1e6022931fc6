"""Bucketed co-located join: same-bucketed tables must join with ZERO
exchanges while the plain parquet join shuffles both sides."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from gdal_scripts_spark import bucketing, fixtures, joins


def test_bucketed_join_is_shuffle_free(spark):
    pts = joins.with_cell(fixtures.points_spark(spark, 5000), z=6)
    dim = (
        pts.select("cell").distinct().limit(200)
        .withColumn("weight", F.pmod(F.col("cell"), F.lit(97)))
    )
    spark.sql("DROP TABLE IF EXISTS b_pts")
    spark.sql("DROP TABLE IF EXISTS b_dim")
    bucketing.write_bucketed(pts, "b_pts", key="cell", n_buckets=8)
    bucketing.write_bucketed(dim, "b_dim", key="cell", n_buckets=8)
    # broadcast would hide the effect: force it off for the comparison
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        co = bucketing.bucketed_join(spark, "b_pts", "b_dim", "cell")
        n_co = bucketing.count_exchanges(co)
        plain = pts.join(dim, "cell")
        n_plain = bucketing.count_exchanges(plain)
        assert n_co == 0, f"bucketed join still shuffles: {n_co} exchanges"
        assert n_plain >= 2, n_plain  # both sides exchange without buckets
        # same answer either way
        assert co.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_pts")
        spark.sql("DROP TABLE IF EXISTS b_dim")

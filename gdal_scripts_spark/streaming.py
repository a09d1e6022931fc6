"""Incremental ingest via Structured Streaming (SURVEY.md §2.10).

The reference is strictly batch (no streaming operators exist in the GDAL
script family); the engine still needs incremental ingest of new images at
10^12-image scale. Spark-first mapping: a file/Iceberg streaming source with
``Trigger.AvailableNow`` (drain-everything-then-stop), the tile/cell encode
as ordinary native-Column transformations, and an idempotent parquet sink
keyed by checkpointLocation — exactly-once per input file without any custom
bookkeeping (the checkpoint dir plays the manifest's role at file
granularity; unit-level lineage lives in checkpoint.py).

Watermarks / stateful ops are intentionally absent: the reference has no
event-time semantics to match (documented divergence, SURVEY.md §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import cells
from .fixtures import IMAGES_SCHEMA


def stream_cell_encode(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    z: int = 8,
    await_termination: bool = True,
):
    """Drain new image parquet files from input_dir -> cell/tile-encoded
    parquet in output_dir. Re-running after new files arrive processes ONLY
    the new files (file-source offset log in checkpoint_dir)."""
    src = spark.readStream.schema(IMAGES_SCHEMA).parquet(input_dir)
    tx, ty = cells.lonlat_to_tile_tms(F.col("lon"), F.col("lat"), z)
    enc = src.select(
        "image_id", "caption", "phash", "lon", "lat",
        tx.alias("tx"), ty.alias("ty"),
        cells.tms_to_xyz_y(ty, z).alias("y_xyz"),
        cells.quadkey(tx, ty, z).alias("quadkey"),
        cells.cell_id(F.col("lon"), F.col("lat"), z).alias("cell"),
    )
    q = (
        enc.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q

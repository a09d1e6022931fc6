"""Incremental ingest via Structured Streaming (SURVEY.md §2.10).

The reference is strictly batch (no streaming operators exist in the GDAL
script family); the engine still needs incremental ingest of new images at
10^12-image scale. Spark-first mapping: a file/Iceberg streaming source with
``Trigger.AvailableNow`` (drain-everything-then-stop), the tile/cell encode
as ordinary native-Column transformations, and an idempotent parquet sink
keyed by checkpointLocation — exactly-once per input file without any custom
bookkeeping (the checkpoint dir plays the manifest's role at file
granularity; unit-level lineage lives in checkpoint.py).

The reference has no event-time semantics to match, but the 100-TB
training-pipeline brief does: ``stream_windowed_counts`` is the watermarked
event-time tumbling aggregation (late rows beyond the watermark drop,
finalized windows emit once), and ``stream_first_seen`` is a CUSTOM
stateful operator via ``applyInPandasWithState`` — streaming exact dedup
that emits only the first occurrence of each key, state surviving restarts
through the checkpoint (the incremental-ingest companion of
``textops.dedup_exact``).
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


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    schema: str = "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string",
    await_termination: bool = True,
):
    """Event-time tumbling-window counts with a watermark: rows later than
    ``watermark`` behind the max seen event time are dropped, and append
    mode emits each window exactly once when it finalizes — the standard
    late-data contract. AvailableNow drains what exists, then stops; re-runs
    continue from the checkpoint."""
    src = spark.readStream.schema(schema).parquet(input_dir)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type", "n", "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_first_seen(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    key: str = "image_id",
    schema: str = None,
    await_termination: bool = True,
):
    """Custom stateful streaming operator (``applyInPandasWithState``):
    exact first-occurrence dedup — for every key, emit the first row ever
    seen and suppress all later duplicates, with the seen-state persisted
    in the streaming checkpoint (so duplicates arriving in LATER availableNow
    drains are still suppressed). The streaming face of exact dedup for an
    incrementally ingested corpus."""
    import pandas as pd

    schema = schema or IMAGES_SCHEMA

    def first_seen(key_tuple, pdfs, state):
        n_new = 0
        first_row = None
        for pdf in pdfs:
            if len(pdf) and first_row is None:
                first_row = pdf.iloc[:1]
            n_new += len(pdf)
        if state.exists:
            (seen,) = state.get
            state.update((seen + n_new,))
            return iter(())
        state.update((n_new,))
        return iter([first_row[["image_id", "caption", "phash"]]])

    src = spark.readStream.schema(schema).parquet(input_dir)
    out = (
        src.groupBy(key)
        .applyInPandasWithState(
            first_seen,
            outputStructType="image_id string, caption string, phash long",
            stateStructType="n_seen long",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q

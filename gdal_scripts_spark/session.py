"""SparkSession factory.

Local-mode tuning notes (tests run on one JVM, ``local[N]``):
- shuffle partitions default to core count, not 200 — at 100 TB deployment
  this is overridden per-job to ~2-3x total cores or managed by AQE.
- Arrow batching is governed by BOTH knobs: ``maxRecordsPerBatch`` high
  (131072 — skinny candidate rows need big batches or per-batch Python
  round-trip overhead dominates; round-3 A/B: 10k->131k batches cut the
  PiP-refine wall 25% at local[8] and let the kernel overlap fully into
  the serDe floor) while ``maxBytesPerBatch`` (32 MB) caps fat
  image-payload rows, bounding Python-worker memory (SURVEY.md §4
  "Physical-execution decisions") — fat rows hit the bytes cap long
  before the row cap, so raising the row cap is free for them.
- AQE on: runtime coalescing + skew-join splitting complement the explicit
  hot-cell salting in :mod:`gdal_scripts_spark.joins`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "gdal_scripts_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = 131_072,
    arrow_batch_bytes: str = "32m",
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned local SparkSession.

    ``cpus`` controls ``local[N]``; on a real cluster the same conf block is
    passed to ``spark-submit`` and master/executor counts come from the
    cluster manager — nothing here is local-mode-only except the master URL.
    """
    n = cpus or DEFAULT_CPUS
    b = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.sql.execution.arrow.maxBytesPerBatch", arrow_batch_bytes)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.net.preferIPv4Stack=true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

"""Bucketed co-located joins — the pre-shuffle strategy the 100 TB brief
calls for ("co-locate joins via bucketing") demonstrated as a first-class
utility.

Spark bucketing (`DataFrameWriter.bucketBy` + `saveAsTable`) pre-hashes a
table into N buckets on the join key at WRITE time; a later equi-join
between two tables bucketed the same way (same key, same N) runs with NO
shuffle on either side — Catalyst's EnsureRequirements sees the hashed
output partitioning already satisfies the join's distribution. For the
engine's workloads the natural bucket key is the spatial cell id: the
points/images table and any cell-keyed dimension (polygon cover cells, tile
manifests) bucketed by `cell` join shuffle-free, which at 10^12 rows
removes the single largest cost of the spatial join (the points-side
exchange). Deployment note: on Iceberg the same effect is
`PARTITIONED BY (bucket(N, cell))`; this module uses the session catalog's
managed tables (spark-warehouse locally) so the plan effect is testable
offline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str = "cell", n_buckets: int = 16,
    sort_by: str | None = None, mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally sorted)
    by the join key. One shuffle now, zero at every subsequent join."""
    w = df.write.mode(mode).bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "cell",
) -> DataFrame:
    """Equi-join two same-bucketed tables. With both sides bucketed on
    ``key`` with equal bucket counts the physical plan contains NO Exchange
    (asserted in tests) — the join is co-located by construction."""
    return spark.table(left_table).join(spark.table(right_table), key)


def count_exchanges(df: DataFrame) -> int:
    """# of Exchange (shuffle) nodes in the physical plan — the evidence
    metric for co-location."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")

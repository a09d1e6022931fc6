"""Mergeable distinct-count sketches as DataFrame plans.

KMV (k-minimum-values) distinct-count estimation — Bar-Yossef et al.,
"Counting distinct elements in a data stream" (RANDOM 2002); the
Theta-sketch family's base estimator (Dasgupta et al., "Theta-Sketch
Framework", 2016). Engine parity target: the GDAL/OGR utility family has no
sketch surface; this is an engine extra for the 100-TB training-pipeline
story where COUNT(DISTINCT) per group is a full shuffle of every key but a
KMV sketch shuffles at most ``k`` 8-byte hash mins per group per partition.

Why KMV and not HyperLogLog here: Spark's built-in
``approx_count_distinct`` (HLL++) is a black box whose estimate no second
engine reproduces, so a driver-style independent oracle cannot exist for
it. KMV over md5 is ENGINE-PORTABLE ARITHMETIC — any SQL engine with md5,
row_number and fixed-width hex can re-derive the exact same estimate — so
the sketch gets a true cross-engine oracle instead of a committed golden
(same doctrine as the md5-bucket deterministic sampler, textops.py).

Estimator: hash every key to a uniform point in (0,1) via the first 12 hex
chars of md5 (48 bits — collision-free fractions at any realistic k);
keep the k smallest distinct hash values per group. If fewer than k
distinct hashes exist the sketch is exact (est = count). Otherwise
est = (k-1) / h_(k) where h_(k) is the k-th minimum normalized by 16^12
(the classic unbiased KMV form).

Scale shape: distinct(group, hash) partial-aggregates map-side; the
optional Arrow-batched per-partition combine (``partial=True``) then cuts
each partition's contribution to <= k rows per group BEFORE the per-group
shuffle — the mergeable-sketch property, expressed as mapInPandas — so the
global window sorts at most k * n_partitions rows per group no matter how
hot the group is. No row-Python anywhere; the estimate itself is pure
Column arithmetic.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_PREFIX = 12                      # 48 bits of the md5 -> exact in double
_HEX_SCALE = float(16 ** _HEX_PREFIX)  # 281474976710656.0


def _kmv_partial_topk(group_cols: Sequence[str], k: int):
    """Per-partition combine: keep the k smallest hashes per group seen in
    this partition (across all of its Arrow batches). State is
    k * groups-in-partition rows — bounded regardless of group heat."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.DataFrame | None = None
        cols = [*group_cols, "_h"]
        for pdf in batches:
            both = pdf[cols] if acc is None else pd.concat(
                [acc, pdf[cols]], ignore_index=True)
            both = both.sort_values("_h", kind="mergesort")
            acc = both.groupby(list(group_cols), sort=False).head(k)
        yield acc if acc is not None else pd.DataFrame(columns=cols)

    return fn


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int = 64,
    partial: bool = True,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group via a k-minimum-values
    sketch. Returns one row per group: ``est_distinct`` (long; exact when
    the group holds < k distinct keys), ``n_kept`` (long, min(d, k))."""
    if k < 2:
        raise ValueError(f"kmv_distinct: need k >= 2 (got {k})")
    group_cols = list(group_cols)
    h = F.md5(F.col(key_col).cast("string"))
    dh = df.select(*group_cols, h.alias("_h")).distinct()
    if partial:
        dh = dh.mapInPandas(_kmv_partial_topk(group_cols, k), dh.schema)
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = (
        dh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.lit(k))
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"), F.max("_h").alias("_kth")
    )
    return agg.select(
        *group_cols,
        _kmv_estimate(F.col("n_kept"), F.col("_kth"), k).alias("est_distinct"),
        F.col("n_kept").cast("long").alias("n_kept"),
    )


def _kmv_estimate(n_kept: Column, kth_hex: Column, k: int) -> Column:
    """(k-1)/h_(k) when the sketch is full, exact count otherwise. The
    12-hex prefix value is an exact integer in a double (< 2^48 < 2^53), so
    the division and round reproduce bit-identically in any IEEE engine."""
    kth_val = F.conv(F.substring(kth_hex, 1, _HEX_PREFIX), 16, 10).cast("double")
    full = F.round(F.lit(float(k - 1)) * F.lit(_HEX_SCALE) / kth_val, 0)
    return F.when(n_kept < F.lit(k), n_kept.cast("double")).otherwise(full).cast("long")

"""Embedding similarity over the ``embeddings`` table (driver prompt:
similarity search as a first-class component).

- brute-force cosine top-k: the exactness baseline. Dot products as native
  ``F.zip_with``/``F.aggregate`` array expressions (JVM-side, codegen) —
  no Python in the loop; top-k via the W2 window.
- LSH-bucketed ANN: random-hyperplane signatures (sign of dot with seeded
  deterministic pseudo-random planes) -> bucket equi-join; the scale path
  that avoids the n^2 cross join. Recall measured against brute force in
  tests.
- cosine near-dup: pairs above a cosine threshold (embedding-space dedup).

Scale notes: brute-force is O(Q*N) — at 10^9 rows it is a broadcast of the
QUERY side only (points side never shuffles); IVF/LSH prunes candidates by
bucket. Sums are double-precision in array order so results are
reproducible run-to-run.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_cols(a: Column, b: Column) -> Column:
    a = a.cast("array<double>")
    b = b.cast("array<double>")
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    qid: str = "vec_id", cid: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """(qid, rank, neighbor_id, cos) exact top-k; self-match excluded;
    ties by neighbor id asc."""
    q = queries.select(F.col(qid).alias("qid"), F.col(vec).alias("qv"))
    c = corpus.select(F.col(cid).alias("neighbor_id"), F.col(vec).alias("cv"))
    wnd = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        F.broadcast(q).crossJoin(c)
        .filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("cos", cosine_cols(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def _planes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane bit signature as a long (<=63 planes)."""
    v = vec.cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(x) for x in p]), lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def cosine_topk_lsh(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_planes: int = 16,
    bands: int = 4, dim: int = 64, seed: int = 7,
    qid: str = "vec_id", cid: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature band.

    Recall < 1 by construction; tests measure it against brute force.
    Bucket join keeps the candidate set ~ N * P(band match) per query.

    Shuffle discipline (the round-1 fix): the band join and the candidate
    dedupe carry ONLY (qid, neighbor_id) ids — never embedding payloads.
    Vectors re-attach afterwards: the deduped candidate set (small, query-
    bounded) broadcasts against the corpus, so corpus vectors are scanned
    in place and never shuffled; query vectors broadcast (query side is the
    small side by contract, as in the brute baseline)."""
    assert n_planes % bands == 0
    r = n_planes // bands
    planes = _planes(dim, n_planes, seed)
    mask = (1 << r) - 1

    def banded(df, idc, vc, side):
        sig = lsh_signature(F.col(vc), planes)
        return df.select(
            F.col(idc).alias(side), sig.alias("sig")
        ).select(
            side,
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("sig"), b * r).bitwiseAND(F.lit(mask)).alias("bh"),
                )
                for b in range(bands)
            ])).alias("p"),
        ).select(side, "p.band", "p.bh")

    qb = banded(queries, qid, vec, "qid")
    cb = banded(corpus, cid, vec, "neighbor_id")
    cand = (
        qb.join(cb, ["band", "bh"])
        .filter(F.col("qid") != F.col("neighbor_id"))
        .select("qid", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(qid).alias("qid"), F.col(vec).alias("qv"))
    cv = corpus.select(F.col(cid).alias("neighbor_id"), F.col(vec).alias("cv"))
    wnd = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cv.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(qv), "qid")
        .withColumn("cos", cosine_cols(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )


def cosine_near_dup_pairs(
    corpus: DataFrame, threshold: float = 0.95,
    cid: str = "vec_id", vec: str = "embedding", group: str | None = None,
) -> DataFrame:
    """(id_a, id_b) with cosine >= threshold (embedding dedup). Optional
    blocking column `group` turns the cross join into a per-group join."""
    a = corpus.select(F.col(cid).alias("id_a"), F.col(vec).alias("va"),
                      *( [F.col(group).alias("g")] if group else [] ))
    b = corpus.select(F.col(cid).alias("id_b"), F.col(vec).alias("vb"),
                      *( [F.col(group).alias("g")] if group else [] ))
    j = a.join(b, "g") if group else a.crossJoin(b)
    return (
        j.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_cols(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the other classic scale path next to LSH
# ---------------------------------------------------------------------------

def _kmeans_lite(sample: np.ndarray, k: int, iters: int = 10,
                 seed: int = 11) -> np.ndarray:
    """Tiny driver-side Lloyd's k-means on a bounded sample (deterministic
    seeding): the coarse quantizer. Public textbook algorithm; a few
    thousand sample rows x small k is millisecond work on the driver."""
    rng = np.random.default_rng(seed)
    k = min(k, len(sample))
    cent = sample[rng.choice(len(sample), k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def _nearest_centroids_arrow(vec: Column, cent: np.ndarray, n: int) -> Column:
    """Arrow-batched twin of :func:`_nearest_centroids_col` for REAL
    centroid counts (IVF at 10^9 vectors wants thousands): one BLAS matmul
    per Arrow batch against the closure-captured centroid matrix instead
    of an unrolled per-centroid Column expression (whose codegen blows up
    past ~64 centroids). Ties broken by ascending centroid id (stable
    argsort), same rule as the Column path's struct sort."""
    c = np.ascontiguousarray(cent, dtype=np.float64)
    c2 = (c * c).sum(axis=1)

    @F.pandas_udf("array<int>")
    def kern(s: pd.Series) -> pd.Series:
        if s.empty:
            return pd.Series([], dtype=object)
        m = np.array(s.tolist(), dtype=np.float64)
        # |v-c|^2 = |v|^2 - 2 v.c + |c|^2 ; |v|^2 constant per row, skip it
        d2 = c2[None, :] - 2.0 * (m @ c.T)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :n].astype(np.int32)
        return pd.Series([row.tolist() for row in idx])

    return kern(vec.cast("array<double>"))


def nearest_centroids(vec: Column, cent: np.ndarray, n: int) -> Column:
    """Dispatch: codegen Column expression for small coarse quantizers,
    Arrow matmul kernel beyond 64 centroids."""
    if len(cent) > 64:
        return _nearest_centroids_arrow(vec, cent, n)
    return _nearest_centroids_col(vec, cent, n)


def _nearest_centroids_col(vec: Column, cent: np.ndarray, n: int) -> Column:
    """Array of the ``n`` nearest centroid ids — native Column expressions
    (per-centroid squared distance via aggregate/zip_with, then argsort by
    constructing (dist, id) structs and array_sort), zero UDF."""
    v = vec.cast("array<double>")
    structs = []
    for ci, c in enumerate(cent):
        carr = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(v, carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        structs.append(F.struct(d.alias("d"), F.lit(ci).alias("cid")))
    ranked = F.array_sort(F.array(*structs))
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cid"])


def cosine_topk_ivf(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_centroids: int = 16,
    n_probe: int = 4, sample_n: int = 2048, seed: int = 11,
    qid: str = "vec_id", cid: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in the bucket of their
    nearest coarse centroid; each query probes its ``n_probe`` nearest
    buckets and ranks only those candidates.

    Scale shape: centroids come from a bounded driver-side sample (one
    ``limit(sample_n)`` collect); bucket assignment is a NATIVE column
    expression, so the corpus is scanned in place and partitions by a plain
    equi-join key; candidate volume ~= corpus * n_probe / n_centroids per
    query. Recall measured against brute force in tests; exactness is the
    brute path's job."""
    # orderBy before limit: an unordered limit's row order is partition-
    # layout-dependent, which would make the seeded k-means (and therefore
    # the committed goldens) vary with core count
    sample = np.array(
        [r[1] for r in corpus.select(cid, vec).orderBy(cid).limit(sample_n).collect()],
        dtype=np.float64,
    )
    cent = _kmeans_lite(sample, n_centroids, seed=seed)
    cb = corpus.select(
        F.col(cid).alias("neighbor_id"), F.col(vec).alias("cv"),
        nearest_centroids(F.col(vec), cent, 1)[0].alias("bucket"),
    )
    qb = queries.select(
        F.col(qid).alias("qid"), F.col(vec).alias("qv"),
        F.explode(
            nearest_centroids(F.col(vec), cent, n_probe)
        ).alias("bucket"),
    )
    wnd = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("cos", cosine_cols(F.col("qv"), F.col("cv")))
        .withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "neighbor_id", F.round("cos", 6).alias("cos"))
    )

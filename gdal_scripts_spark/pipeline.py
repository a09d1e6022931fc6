"""End-to-end training-data ingest: the composite every other text op
feeds.

One call takes a NEW document batch and an EXISTING corpus and returns the
rows worth keeping, applying the standard web-pipeline stages in order:

1. normalize     — textops.normalize_text (engine-portable, idempotent)
2. quality gate  — min length + digit-ratio cap (textops.quality_columns)
3. exact dedup   — one normalized text survives per batch, min doc_id wins;
                   batch texts already present in the corpus are dropped
4. near-dup gate — n-gram Jaccard pairs >= threshold over corpus + batch
                   (textops.ngram_jaccard_pairs), resolved by connected
                   components (graph.py): a batch doc survives iff its
                   component contains NO corpus doc and it is the
                   component's minimum id (one keeper per new cluster;
                   anything transitively linked to the corpus already has
                   a representative there)
5. sampling      — optional md5-bucket stratified rates per language
                   (textops.stratified_sample), reproducible on any engine

Scale notes: stage 4 here uses the EXACT shingle join — the semantics
oracle. At 100 TB swap it for textops.minhash_lsh_pairs_incremental over a
persisted band index (same pair schema, drop-in), then verify survivors
with the exact join on the candidate set only; every stage stays an
equi-join/aggregate — no cross joins, no driver loops (the cluster step
rides graph.connected_components, hybrid single-task under 5M edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import graph, textops


def ingest_documents(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    jaccard_threshold: float = 0.5,
    ngram: int = 8,
    min_chars: int = 40,
    max_digit_ratio: float = 0.3,
    rates: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc_id, lang, norm_text) — the batch rows a pipeline keeps."""
    q = textops.quality_columns(text_col)
    b = (
        batch.withColumn("norm_text", textops.normalize_text(text_col))
        .filter(
            (F.length("norm_text") >= min_chars)
            & (q["digit_ratio"] <= max_digit_ratio)
        )
        .select(id_col, lang_col, "norm_text")
    )
    c_norm = corpus.select(
        F.col(id_col).alias("_cid"),
        textops.normalize_text(text_col).alias("norm_text"),
    )

    # exact dedup within the batch (min id keeps) and against the corpus
    keep_exact = b.groupBy("norm_text").agg(F.min(id_col).alias(id_col))
    b = b.join(keep_exact, [id_col, "norm_text"], "left_semi")
    b = b.join(c_norm.select("norm_text").distinct(), "norm_text", "left_anti")

    # near-dup pairs over corpus + surviving batch (exact verifier join;
    # see module docstring for the LSH swap at scale)
    uni = b.select(F.col(id_col), F.col("norm_text").alias(text_col)).unionByName(
        c_norm.select(F.col("_cid").alias(id_col), F.col("norm_text").alias(text_col))
    )
    pairs = textops.ngram_jaccard_pairs(
        uni, threshold=jaccard_threshold, n=ngram, text_col=text_col, id_col=id_col
    )
    # resolve transitively: keep a batch doc iff its component has no
    # corpus member and it is the component minimum (component ids span
    # corpus + batch, so "minimum" alone implies both when the component
    # is corpus-free)
    cc = graph.connected_components(pairs, src="id_a", dst="id_b")
    corpus_comps = (
        cc.join(
            c_norm.select(F.col("_cid").alias("id")), "id", "left_semi"
        )
        .select("comp")
        .distinct()
    )
    clean_keepers = (
        cc.join(corpus_comps, "comp", "left_anti")
        .groupBy("comp")
        .agg(F.min("id").alias(id_col))
        .select(id_col)
    )
    in_pairs = cc.select(F.col("id").alias(id_col))
    b = b.join(in_pairs, id_col, "left_anti").unionByName(
        b.join(clean_keepers, id_col, "left_semi")
    )

    if rates:
        b = textops.stratified_sample(b, id_col, lang_col, rates)
    return b.select(id_col, lang_col, "norm_text")

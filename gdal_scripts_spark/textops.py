"""Text/dedup operators for large-scale training-data pipelines over the
``documents`` table — first-class engine components alongside SURVEY.md §2
(driver prompt: dedup, text analysis).

All hot paths are native Column expressions or array functions (JVM-side);
the only Python is in nothing here — minhash/simhash are built from
``F.xxhash64`` over exploded shingles, so the whole pipeline stays in
whole-stage codegen and scales as plain shuffles.

Operators:
- exact dedup:        hash-groupBy on text (keep min doc_id)
- n-gram Jaccard:     exact character-3-gram Jaccard via shingle explode +
                      pair join (the verification oracle for the LSH paths)
- MinHash + LSH:      k hash functions simulated by xxhash64(gram, seed);
                      signature banding -> candidate pairs via band-bucket
                      equi-join (never an n^2 cross join)
- SimHash:            64-bit sign-aggregated token hash; near-dup = small
                      hamming distance, bucketed by rotated prefixes
- language id:        marker-stopword count argmax (n-gram heuristic)
- quality scoring:    length / punctuation / digit / stopword ratios
- token counting:     whitespace tokens + a BPE-ish subword regex estimate
- fingerprinting:     md5 content fingerprint + shingle-set cardinality
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: keeper = min id, n_dups = group size."""
    return docs.groupBy(text_col).agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("n_dups")
    ).select("keeper_id", "n_dups")


# ---------------------------------------------------------------------------
# character shingles (3-grams) — the substrate for jaccard/minhash
# ---------------------------------------------------------------------------

def shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """(id, gram) distinct character n-grams — native sequence+explode."""
    return (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1))),
                        lambda i: F.col(text_col).substr(i, F.lit(n)),
                    )
                )
            ).alias("gram"),
        )
        .filter(F.length("gram") == n)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.5, n: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard >= threshold pairs (id_a < id_b) via shingle join.

    Scale path note: the gram join explodes by document length; at 100 TB
    this runs AFTER minhash banding prunes candidates — provided here as the
    exact verifier and for modest corpora."""
    # no persist: shingles is a cheap narrow transform and caching it here
    # leaked blocks for the caller's lifetime (the knn.py round-2 bug class).
    # Recomputing it for sizes/a/b keeps the plan lazy and leak-free.
    sh = shingles(docs, n, text_col, id_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "gram")
    b = sh.select(F.col("id").alias("id_b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------

def minhash_signatures(docs: DataFrame, num_hashes: int = 32, n: int = 3,
                       text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, sig array<long>) — k minhashes via xxhash64(gram, seed k)."""
    sh = shingles(docs, n, text_col, id_col)
    aggs = [
        F.min(F.xxhash64(F.col("gram"), F.lit(k))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"h{k}" for k in range(num_hashes)]).alias("sig"))


def minhash_band_table(docs: DataFrame, num_hashes: int = 32, bands: int = 8,
                       n: int = 3, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, band, bh) — the persistable LSH band index of a corpus.

    bands of r = num_hashes/bands rows, bh = hash of the band's
    sub-signature. This table IS the deployment artifact for incremental
    dedup at scale: write it bucketed by (band, bh) once, and every new
    batch probes it with an equi-join instead of re-signing the corpus."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    return sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(*[F.col("sig")[b * r + i] for i in range(r)]).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bh")


def minhash_lsh_pairs(docs: DataFrame, num_hashes: int = 32, bands: int = 8,
                      n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Candidate near-dup pairs by banded minhash (id_a < id_b, distinct).

    pair is a candidate iff some band's sub-signature matches exactly — the
    classic LSH S-curve. The band join is an equi-join on (band, bh),
    shuffle-friendly and skew-safe (band buckets are uniformly hashed)."""
    banded = minhash_band_table(docs, num_hashes, bands, n, text_col, id_col)
    a = banded.select(F.col("id").alias("id_a"), "band", "bh")
    b = banded.select(F.col("id").alias("id_b"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental near-dup candidates for a NEW batch against an EXISTING
    corpus band index (:func:`minhash_band_table` output) — the production
    shape of streaming dedup: only the increment is shingled and signed
    (O(|new|) work), the corpus is touched through one equi-join probe of
    its persisted index, never recomputed.

    Returns all candidate pairs TOUCHING the increment — new-vs-corpus and
    new-vs-new — as (id_a, id_b), id_a < id_b, distinct. Identity pinned by
    test: equal to ``minhash_lsh_pairs(corpus ∪ new)`` filtered to pairs
    with at least one new id (same hashes, same bands)."""
    nb = minhash_band_table(new_docs, num_hashes, bands, n, text_col, id_col)
    probe = nb.select(F.col("id").alias("id_new"), "band", "bh")
    vs_corpus = probe.join(
        corpus_bands.select(F.col("id").alias("id_old"), "band", "bh"),
        ["band", "bh"],
    ).select(
        F.least("id_new", "id_old").alias("id_a"),
        F.greatest("id_new", "id_old").alias("id_b"),
    )
    b2 = nb.select(F.col("id").alias("id_b2"), "band", "bh")
    vs_new = (
        probe.join(b2, ["band", "bh"])
        .filter(F.col("id_new") < F.col("id_b2"))
        .select(F.col("id_new").alias("id_a"), F.col("id_b2").alias("id_b"))
    )
    return (
        vs_corpus.filter(F.col("id_a") != F.col("id_b"))
        .union(vs_new)
        .distinct()
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long): sign-sum of xxhash64 token bits over whitespace
    tokens — fully native (explode + per-bit conditional sums)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    per_bit = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agg = toks.groupBy("id").agg(*per_bit)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("id", sim.alias("simhash"))


def hamming64_col(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def hamming_block_structs(hcol: Column, n_blocks: int) -> list[Column]:
    """``n_blocks`` contiguous bit-blocks covering all 64 bits as evenly as
    possible, each as struct(rot, pre). Pigeonhole guarantee: a pair with
    hamming distance <= n_blocks - 1 has at least one block with ZERO
    differing bits, so bucketing on (rot, pre) has recall exactly 1.0 for
    max_hamming = n_blocks - 1 (multi-index hamming search, Norouzi et al.,
    public method). More blocks = sound for larger radii but wider buckets
    (64/n_blocks bits each) — callers pick the radius, the block count
    follows."""
    if not 2 <= n_blocks <= 64:
        raise ValueError(
            f"n_blocks={n_blocks} out of range [2, 64]; n_blocks is "
            "max_hamming + 1 — for max_hamming=0 use an exact-hash equi-join "
            "on the full 64-bit value instead of block bucketing"
        )
    base, rem = divmod(64, n_blocks)
    out, start = [], 0
    for i in range(n_blocks):
        ln = base + (1 if i < rem else 0)
        out.append(
            F.struct(
                F.lit(i).alias("rot"),
                F.shiftrightunsigned(hcol, start)
                .bitwiseAND(F.lit((1 << ln) - 1)).alias("pre"),
            )
        )
        start += ln
    return out


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming — EXACT recall:
    bucket by max_hamming+1 bit-blocks (pigeonhole: some block matches
    exactly for every qualifying pair), verify hamming exactly. Never n^2."""
    sh = simhash64(docs, text_col, id_col)
    blocks = hamming_block_structs(F.col("simhash"), max_hamming + 1)
    buck = sh.select("id", "simhash", F.explode(F.array(*blocks)).alias("p")).select(
        "id", "simhash", "p.rot", "p.pre"
    )
    a = buck.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "rot", "pre")
    b = buck.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "rot", "pre")
    return (
        a.join(b, ["rot", "pre"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# language id / quality / tokens / fingerprint — pure Column expressions
# ---------------------------------------------------------------------------

LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "et", "les"),
    "es": ("el", "que", "los"),
}


def _count_occurrences(text: Column, word: str) -> Column:
    """# of occurrences of ' word ' (padded) — length-difference trick,
    expressible identically in any SQL dialect (oracle parity)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    needle = f" {word} "
    return (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit("")))) / len(needle)


def lang_id(docs: DataFrame, text_col: str = "text") -> Column:
    """Predicted language = argmax of marker-word counts ('und' beats 'the'
    ties by dict order en>de>fr>es via strictly-greater chain)."""
    scores = {
        lang: sum(
            (_count_occurrences(F.lower(F.col(text_col)), w) for w in words),
            F.lit(0.0),
        )
        for lang, words in LANG_MARKERS.items()
    }
    best = F.lit("unknown")
    best_score = F.lit(0.0)
    for lang in ("es", "fr", "de", "en"):  # later wins ties -> en priority
        cond = scores[lang] >= F.greatest(best_score, F.lit(1e-9))
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    t = F.col(text_col)
    n = F.length(t).cast("double")
    digits = n - F.length(F.regexp_replace(t, "[0-9]", ""))
    punct = n - F.length(F.regexp_replace(t, "[.,;:!?]", ""))
    spaces = n - F.length(F.replace(t, F.lit(" "), F.lit("")))
    words = spaces + 1
    return {
        "n_chars_q": n.cast("long"),
        "digit_ratio": F.round(digits / F.greatest(n, F.lit(1.0)), 6),
        "punct_ratio": F.round(punct / F.greatest(n, F.lit(1.0)), 6),
        "mean_word_len": F.round((n - spaces) / F.greatest(words, F.lit(1.0)), 6),
    }


def token_count_ws(text_col: str = "text") -> Column:
    """# whitespace-separated non-empty tokens (native array filter)."""
    return F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != ""))


def token_count_bpe_ish(text_col: str = "text") -> Column:
    """BPE-ish upper-bound token estimate: ceil(chars/4) + word count — the
    standard 4-chars-per-token heuristic, deterministic and cheap."""
    n = F.length(F.col(text_col)).cast("double")
    return (F.ceil(n / 4.0) + token_count_ws(text_col)).cast("long")


def fingerprint_md5(text_col: str = "text") -> Column:
    return F.md5(F.col(text_col))


def word_ngrams(text_col: str = "text", n: int = 8) -> Column:
    """``array<string>`` of word-level n-grams (space-joined sliding
    windows over the whitespace tokens). The whitespace class is spelled
    out ([ \\t\\n\\r\\f]) so Java regex and RE2/POSIX oracles agree. Pure
    Column HOFs — transform over a sequence of window starts, whole-stage
    codegen, no Python. Spark sequences run DESCENDING when start > stop,
    so short documents are gated to an empty array explicitly."""
    toks = F.filter(
        F.split(F.col(text_col), "[ \t\n\r\f]+"), lambda x: x != ""
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.expr("array()").cast("array<string>")
    )


def decontaminate(
    docs: DataFrame,
    n: int = 8,
    bench_mod: int = 37,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination — the word-n-gram-overlap scan web-scale
    training pipelines run before release (public methodology: GPT-3
    App. C "13-gram overlap", PaLM/Llama data cards): count, per training
    document, the distinct word n-grams it shares with a held-out
    benchmark set. Here the benchmark slice is the deterministic
    ``doc_id % bench_mod == 0`` subset (a stand-in for an eval suite);
    production swaps in the real benchmark table.

    Shape at 10^12 docs: when the benchmark n-gram index is tiny (eval
    suites are megabytes — the production regime) it is built once and
    BROADCAST, so the training corpus is never shuffled by gram. For a
    LARGE benchmark set (``broadcast_bench=False``) the broadcast's
    driver-serial hashed-relation build becomes the bottleneck — a
    measured ~0.26 N->4N efficiency wall on the standalone cluster —
    and a plain shuffle equi-join on the 64-bit hash is the right plan
    (0.74+ with everything else unchanged). Per-doc distinct grams is
    one shuffle on (id, 64-bit hash); gram strings themselves never
    enter an exchange. Output: (doc_id, n_overlap) for contaminated
    docs only.
    """
    g = (
        docs.select(
            F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("gram")
        )
        .select(id_col, F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    bench = g.filter(F.col(id_col) % bench_mod == 0).select("gh").distinct()
    train = g.filter(F.col(id_col) % bench_mod != 0)
    if broadcast_bench:
        bench = F.broadcast(bench)
    return (
        train.join(bench, "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling hash) — Schleimer/Wilkerson/Aiken,
# "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003.
# ---------------------------------------------------------------------------

_WINNOW_BASE = 257
_WINNOW_MOD = 2147483647  # 2^31 - 1 (Mersenne); poly value fits a long


def _winnow_norm(text_col: str) -> Column:
    """Fingerprint-canonical text: lowercase, strip everything outside
    [a-z0-9 ], collapse space runs, trim. Both regex classes are chosen to
    mean the same thing under Java regex (Spark) and the oracle engine."""
    t = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(t, " +", " "))


def _kgram_hashes(t: Column, k: int) -> Column:
    """array<long> of polynomial k-gram hashes over every character
    position of ``t`` (Rabin-Karp rolling-hash family, evaluated directly:
    Horner's rule unrolled k times inside one codegen'd HOF lambda — the
    rolling update form saves nothing under columnar evaluation and the
    direct form is branch-free and oracle-reproducible)."""
    def poly(i: Column) -> Column:
        h = F.ascii(t.substr(i, F.lit(1))).cast("long")
        for j in range(1, k):
            h = h * F.lit(_WINNOW_BASE) + F.ascii(
                t.substr(i + F.lit(j), F.lit(1))).cast("long")
        return h % F.lit(_WINNOW_MOD)

    return F.transform(F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)), poly)


def winnow_fingerprints(
    df: DataFrame, k: int = 5, w: int = 4,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (MOSS; Schleimer et
    al. SIGMOD'03 §2): hash every character k-gram of the normalized text,
    slide a window of ``w`` consecutive gram hashes, keep the minimum of
    each window, and emit the distinct selected hashes as the document's
    fingerprint set — one ``(id, fp)`` row per selected hash.

    Guarantees (from the paper): any shared substring of length
    >= w + k - 1 between two documents yields at least one shared
    fingerprint, and expected density is 2/(w+1) — position-shift-robust
    where whole-document hashes (fingerprint_md5) are not.

    Scale shape: per-document map-side Column HOFs (no Python, no shuffle
    until the final distinct explode), so at 100 TB the cost is one codegen
    pass over the text bytes plus a partial-agg distinct on (id, fp) —
    fingerprints (~8 bytes each at 2/(w+1) density) shuffle, text never
    does. Documents whose normalized text is shorter than ``k`` have no
    k-gram and drop out, same as the oracle.
    """
    if k < 2 or w < 1:
        raise ValueError(f"winnow_fingerprints: need k >= 2, w >= 1 (got {k}, {w})")
    t = _winnow_norm(text_col)
    base = (
        df.select(F.col(id_col), t.alias("_wt"))
        .filter(F.length("_wt") >= F.lit(k))
        .select(F.col(id_col), _kgram_hashes(F.col("_wt"), k).alias("_hs"))
    )
    hs = F.col("_hs")
    # windows: s in 1 .. max(ngrams - w + 1, 1); slice() truncates at the
    # array end, so ngrams < w degenerates to one min-of-all window.
    n_win = F.greatest(F.size(hs) - F.lit(w - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda s: F.array_min(F.slice(hs, s, w)),
        )
    )
    return (
        base.select(F.col(id_col), F.explode(fps).alias("fp"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Deterministic sampling + normalization (training-pipeline ops)
# ---------------------------------------------------------------------------

def normalize_text(text_col: str = "text") -> Column:
    """Canonical text normalization for dedup/fingerprinting: lowercase,
    collapse runs of whitespace to one space, trim. Pure Column exprs —
    whole-stage codegen. The whitespace class is spelled out explicitly
    ([ \\t\\n\\r\\f]) so Java-regex and RE2/POSIX engines agree exactly."""
    return F.lower(
        F.trim(F.regexp_replace(F.col(text_col), "[ \t\n\r\f]+", " "))
    )


def _sample_bucket(key: Column, salt: str) -> Column:
    """First 4 hex chars of md5(salt || key) — a uniform 16-bit bucket as a
    fixed-width lowercase hex STRING, so `< threshold` is portable across
    engines (Spark, DuckDB, Trino all emit lowercase md5 hex): no engine-
    specific hash function anywhere, reproducible forever."""
    return F.substring(
        F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary")), 1, 4
    )


def _rate_hex(rate: float) -> str:
    if rate >= 1.0:
        # 'g' sorts above every 4-char hex bucket ('ffff' < 'g'); the naive
        # format(65536) = '10000' would sort BELOW most buckets and drop
        # nearly everything
        return "g"
    return format(min(max(int(round(rate * 65536)), 0), 65535), "04x")


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic, engine-portable ~``rate`` fraction of rows,
    decided only by md5(salt || key): the SAME rows are kept on every run,
    cluster size, and engine — the property training-data pipelines need
    for reproducible subsampling (a re-run or a backfill must not re-roll
    the dice). Raising the rate strictly grows the kept set (nested
    samples); ``salt`` gives independent draws."""
    if rate >= 1.0:
        return df
    return df.filter(
        _sample_bucket(F.col(key_col), salt) < F.lit(_rate_hex(rate))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. language rebalancing: keep
    50% of en, 10% of fr). Same md5-bucket rule as
    :func:`deterministic_sample`, threshold chosen per stratum with a
    CASE chain — one codegen'd filter, no shuffle, no Python."""
    thresh: Column = F.lit(_rate_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(_rate_hex(rate))
        ).otherwise(thresh)
    return df.filter(_sample_bucket(F.col(key_col), salt) < thresh)


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:
    ``dup_token_ratio`` = 1 - distinct/total tokens, ``top_token_frac`` =
    share of the most frequent token, ``n_tokens``. The canonical repeated-
    boilerplate filter of web-scale training pipelines (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", App. A). explode -> two hash
    aggregates, all JVM-side; documents with zero tokens drop out."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    freq = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    return freq.groupBy(id_col).agg(
        (F.lit(1.0) - F.count("*") / F.sum("c")).alias("dup_token_ratio"),
        (F.max("c") / F.sum("c")).alias("top_token_frac"),
        F.sum("c").alias("n_tokens"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 10,
) -> DataFrame:
    """Okapi BM25 document ranking for a fixed query-term set (Robertson &
    Zaragoza, "The Probabilistic Relevance Framework: BM25 and Beyond",
    FnTIR 2009) — the retrieval scorer a training pipeline uses to mine
    topic-targeted documents from a web corpus.

    score(d) = sum_t idf(t) * tf(t,d)*(k1+1) / (tf(t,d) + k1*(1-b+b*|d|/avgdl))
    with idf(t) = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)).

    Plan shape: one token explode feeds BOTH the per-doc length table and
    the (doc, term) counts filtered to the query terms (a literal IN list
    — Catalyst pushes it into the scan side of the aggregate); document
    frequencies are a query-sized table joined back BROADCAST; the corpus
    scalars (N, avgdl) attach to that same broadcast dim via a
    non-foldable constant bucket so no nested-loop join appears anywhere.
    The final top-n sorts on the ROUNDED (4dp) score with the doc id as
    tiebreak, so cross-engine libm-ulp differences in ln() can never
    reorder the cut.

    Returns ``topn`` rows: id col, ``n_terms`` matched, ``score``.
    """
    if not query_terms:
        raise ValueError("bm25_scores: query_terms must be non-empty")
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(text_col), " ")).alias("_t"),
    ).filter(F.col("_t") != "")
    dl = toks.groupBy(id_col).agg(F.count("*").alias("_dl"))
    # corpus scalars on a non-foldable all-zero bucket -> BroadcastHashJoin
    kb = F.pmod(F.xxhash64(F.col(id_col)), F.lit(1)).alias("_kb")
    corpus = dl.groupBy(kb).agg(
        F.count("*").cast("double").alias("_n_docs"),
        F.avg("_dl").alias("_avgdl"),
    )
    tf = (
        toks.filter(F.col("_t").isin([str(t) for t in query_terms]))
        .groupBy(id_col, "_t").agg(F.count("*").alias("_tf"))
    )
    dft = (
        tf.groupBy("_t").agg(F.count("*").cast("double").alias("_df"))
        .withColumn("_kb", F.pmod(F.xxhash64(F.col("_t")), F.lit(1)))
        .join(F.broadcast(corpus), "_kb")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("_df") + F.lit(0.5))
        / (F.col("_df") + F.lit(0.5))
    )
    denom = F.col("_tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    contrib = idf * F.col("_tf") * F.lit(k1 + 1.0) / denom
    # Each (doc, term) holds exactly ONE row after the tf aggregate, so a
    # per-term conditional sum is a sum over a single element (exact), and
    # the total is a FIXED-ORDER chain of adds over the sorted term list —
    # bit-identical in any IEEE engine, unlike sum() over floats whose
    # result depends on row arrival order.
    terms = sorted({str(t) for t in query_terms})
    per_term = [
        F.coalesce(
            F.sum(F.when(F.col("_t") == t, contrib)), F.lit(0.0)
        ).alias(f"_s{i}")
        for i, t in enumerate(terms)
    ]
    scored = (
        tf.join(F.broadcast(dft), "_t")
        .join(dl, id_col)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_terms"), *per_term)
    )
    total = F.col("_s0")
    for i in range(1, len(terms)):
        total = total + F.col(f"_s{i}")
    scored = scored.select(
        id_col, "n_terms", F.round(total, 4).alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(int(topn))


def split_assign(
    key: Column,
    fracs: Sequence[float] = (0.8, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
) -> Column:
    """Deterministic train/val/test split assignment: the md5 16-bit
    bucket of the row key (same portable rule as
    :func:`deterministic_sample`) cut at cumulative-fraction thresholds.
    ``fracs`` gives the first ``len(names)-1`` shares; the last split
    takes the remainder. Keyed on a stable id, the assignment is
    reproducible on any engine, immune to partitioning/row order, and
    stable as the corpus grows — the property random() splits lack.
    Pure Column exprs: one codegen'd CASE, no shuffle."""
    if len(names) != len(fracs) + 1:
        raise ValueError(
            f"split_assign: need len(names) == len(fracs) + 1 "
            f"(got {len(names)} names, {len(fracs)} fracs)")
    if any(f <= 0 for f in fracs) or sum(fracs) >= 1.0:
        raise ValueError(
            f"split_assign: fracs must be > 0 and sum < 1 (got {fracs!r})")
    bucket = _sample_bucket(key, salt)
    out: Column = F.lit(names[-1])
    cum = 0.0
    # build the CASE from the last boundary backwards so earlier
    # (smaller-threshold) branches take precedence
    bounds = []
    for name, f in zip(names[:-1], fracs):
        cum += f
        bounds.append((name, _rate_hex(cum)))
    for name, hexthr in reversed(bounds):
        out = F.when(bucket < F.lit(hexthr), F.lit(name)).otherwise(out)
    return out


def _ws_tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.col(text_col), "[ \t\n\r\f]+"), lambda x: x != ""
    )


def bigram_nll(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    bigram model trained on the corpus itself — the classic LM-perplexity
    quality filter of web-scale pipelines (CCNet/Wenzek et al. 2020 score
    with a KenLM model; this is the self-trained MLE equivalent, fully
    engine-reproducible):

        P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)
        nll(doc)   = -mean(ln P) over the doc's bigrams

    Documents with fewer than 2 tokens drop out. Shape at scale: bigram
    and unigram count tables are plain hash aggregates; scoring is two
    equi-joins on token keys (broadcast here — a corpus-wide LM table is
    small relative to the corpus; shuffle-join if not). Returns
    (doc_id, n_bigrams, nll) with nll rounded to 6."""
    toks = docs.select(F.col(id_col), _ws_tokens(text_col).alias("t"))
    tok = toks.select(id_col, F.explode("t").alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("cu"))
    vocab = uni.count()  # driver scalar: |V| (bounded — vocabulary size)
    big = toks.filter(F.size("t") >= 2).select(
        F.col(id_col),
        F.explode(
            F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1).alias("w1"),
                F.slice("t", 2, F.size("t") - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bc = big.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    scored = (
        big.join(F.broadcast(bc), ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .select(
            id_col,
            F.log((F.col("cb") + F.lit(1.0)) / (F.col("cu") + F.lit(float(vocab))))
            .alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(-F.avg("lp"), 6).alias("nll"),
    )


def _apply_merge(s: Column, left: str, right: str) -> Column:
    """Greedy left-to-right application of one BPE merge (left, right) ->
    left+right over a symbol array, as a pure-Column fold: the classic
    tokenizer merge step with correct overlap handling ('a a a' under
    (a,a) becomes ['aa','a'])."""
    return F.aggregate(
        s,
        F.expr("array()").cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == left) & (x == right),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(left + right)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Byte-pair-encoding merge learning on the corpus (Sennrich et al.,
    "Neural Machine Translation of Rare Words with Subword Units", ACL
    2016 — the tokenizer-training algorithm): start from characters,
    repeatedly merge the most frequent adjacent symbol pair (ties broken
    lexicographically). Returns (step, lhs, rhs, pair_count)
    (named to dodge the LEFT/RIGHT reserved words in ANSI oracles).

    Scale shape: all heavy work happens on the WORD-FREQUENCY table (one
    row per distinct word — millions of rows for a 100-TB corpus, not
    trillions), exactly how production BPE trainers operate. Each round
    is one pair-explode + hash aggregate; the argmax is a driver-bounded
    single-row collect (the graph.py convergence-scalar pattern), and the
    merge applies as a codegen'd array fold — no Python in any hot path.
    """
    words = (
        docs.select(F.explode(_ws_tokens(text_col)).alias("w"))
        .groupBy("w").agg(F.count("*").alias("cnt"))
    )
    cur = words.select(
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
        .alias("s"),
        "cnt",
    ).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(int(n_merges)):
        pairs = (
            cur.filter(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.slice("s", 1, F.size("s") - 1).alias("l"),
                        F.slice("s", 2, F.size("s") - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("c"))
        )
        best = pairs.orderBy(
            F.desc("c"), F.asc("l"), F.asc("r")
        ).limit(1).collect()  # driver-bounded: exactly one row per round
        if not best:
            break
        left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((step, left, right, c))
        cur = cur.select(
            _apply_merge(F.col("s"), left, right).alias("s"), "cnt"
        ).localCheckpoint()  # truncate the per-round lineage
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, pair_count long"
    )


def dup_substring_spans(
    docs: DataFrame, k: int = 50, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplication spans — the strongest dedup signal of
    web-scale pipelines (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", ACL 2022, use a suffix array; this is the
    distributed k-gram formulation): a position is DUPLICATED if its
    k-char gram occurs >= 2 times in the corpus; consecutive duplicated
    positions coalesce into spans (gaps-and-islands window), and
    ``max_dup_len = longest_run + k - 1`` is the length of the longest
    exactly-repeated substring through the doc.

    Scale shape: positions explode to one row per character offset, but
    only (id, pos, 64-bit gram hash) — text itself never re-shuffles; the
    occurrence count is a hash aggregate; the island window partitions by
    doc. Returns (doc_id, n_runs, n_dup_positions, max_dup_len) for docs
    with at least one duplicated position."""
    t = F.col(text_col)
    g = (
        docs.filter(F.length(t) >= k)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - F.lit(k - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(t.substr(i, F.lit(k))).alias("gh"),
                    ),
                )
            ).alias("pg"),
        )
        .select(id_col, F.col("pg.pos").alias("pos"), F.col("pg.gh").alias("gh"))
    )
    cnt = g.groupBy("gh").agg(F.count("*").alias("n"))
    dup = g.join(cnt.filter(F.col("n") >= 2), "gh").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    isl = dup.withColumn("isl", F.col("pos") - F.row_number().over(w))
    runs = isl.groupBy(id_col, "isl").agg(F.count("*").alias("run_len"))
    return runs.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_dup_positions"),
        (F.max("run_len") + F.lit(k - 1)).cast("long").alias("max_dup_len"),
    )

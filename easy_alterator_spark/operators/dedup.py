"""Deduplication operators for large-scale text corpora.

Five families, all shuffle-disciplined for 100 TB inputs:

- **exact**       : md5 fingerprint -> groupBy. Shuffle key is 32 bytes
                    per doc regardless of document size.
- **ngram Jaccard**: exact word-set Jaccard on candidate pairs. The
                    all-pairs form is O(n²) — only for bounded subsets
                    or as the *verify* stage after LSH candidates.
- **MinHash+LSH** : signatures computed row-local (no shuffle), banded;
                    the only shuffle is the band-bucket self-join whose
                    key (band_idx, band_hash) is uniformly distributed
                    by construction.
- **SimHash**     : 64-bit signature row-local; candidate pairs via
                    16-bit band buckets; hamming-distance verify.
- **embedding cosine**: near-dup by cosine over array<float>; brute
                    force for bounded sets, LSH bucketing at scale
                    (see operators/similarity.py).

Everything is pure Column expressions (JVM, whole-stage codegen) — the
per-row signature math uses higher-order functions (transform/filter/
aggregate), never Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T
from ..functions import vectors as V

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_survivors(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One survivor (min id) per canonical-text group + group size."""
    return (
        docs.select(F.col(id_col), T.fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_cnt"))
        .select(id_col, "dup_cnt")
    )


# ---------------------------------------------------------------------------
# exact word-set Jaccard (brute force / verify stage)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs (a < b) with word-set Jaccard >= threshold.

    O(n²) join — callers must bound the input (or feed LSH candidates
    through :func:`verify_jaccard` instead).
    """
    toks = docs.select(
        F.col(id_col).alias("id"), T.distinct_tokens(F.col(text_col)).alias("toks")
    )
    a = toks.select(F.col("id").alias("doc_id_a"), F.col("toks").alias("ta"))
    b = toks.select(F.col("id").alias("doc_id_b"), F.col("toks").alias("tb"))
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(F.array_union("ta", "tb"))
    return (
        a.join(b, F.col("doc_id_a") < F.col("doc_id_b"))
        .withColumn("jac", jac)
        .filter(F.col("jac") >= threshold)
        .select("doc_id_a", "doc_id_b", F.round("jac", 4).alias("jac"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(toks: F.Column, num_perm: int = 64) -> F.Column:
    """num_perm-wide MinHash signature of a token-set column.

    Each permutation is xxhash64 with a distinct seed prefix; the min
    is taken row-locally with array_min — zero shuffle, zero Python.
    Empty token sets get a sentinel hash so they only match each other.

    NB: the seed must be bound via a closure factory — a two-parameter
    ``lambda t, i=i`` would make PySpark pass the *array index* as the
    second lambda variable, silently collapsing all permutations.
    """

    def perm(i: int):
        return lambda t: F.xxhash64(F.concat_ws("\x1f", F.lit(str(i)), t))

    sig = F.array(*[F.array_min(F.transform(toks, perm(i))) for i in range(num_perm)])
    return F.when(F.size(toks) > 0, sig).otherwise(
        F.array(*[F.lit(-(2**62) - i) for i in range(num_perm)])
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash.

    bands=16 × rows=4 over 64 perms -> s-curve threshold ≈ (1/16)^(1/4)
    ≈ 0.5 Jaccard. The self-join shuffles on (band_idx, band_hash) —
    uniformly distributed keys, so no skew at any corpus size.
    """
    rows_per_band = num_perm // bands
    sig = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(T.distinct_tokens(F.col(text_col)), num_perm).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band), F.lit(b))
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("doc_id_a"), F.col("r.id").alias("doc_id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
) -> DataFrame:
    """MinHash-LSH candidates verified with exact word-set Jaccard.

    This is the 100 TB dedup path: signature + banding are map-only;
    the only wide operations are the band self-join and the final
    pair dedup. Token sets ride along with the banded rows and the
    exact-Jaccard verify runs *inside* the join stage (whole-stage
    codegen), so non-duplicate candidates die before ever being
    materialized or shuffled again.
    """
    rows_per_band = num_perm // bands
    # Spread docs across all cores before the expensive per-row
    # signature math and the band join — a single-file parquet source
    # would otherwise pin the whole fused stage to one task.
    sig = (
        docs.select(F.col(id_col).alias("id"), T.distinct_tokens(F.col(text_col)).alias("toks"))
        .repartition("id")
        .select("id", "toks", minhash_signature(F.col("toks"), num_perm).alias("sig"))
    )
    banded = sig.select(
        "id",
        "toks",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band), F.lit(b))
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    jac = F.size(F.array_intersect("l.toks", "r.toks")).cast("double") / F.size(
        F.array_union("l.toks", "r.toks")
    )
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("doc_id_a"),
            F.col("r.id").alias("doc_id_b"),
            jac.alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        .select("doc_id_a", "doc_id_b", F.round("jac", 4).alias("jac"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_bits(toks: F.Column, nbits: int = 64) -> F.Column:
    """SimHash as an array<int> of nbits 0/1 entries, row-local.

    Bit i is 1 iff more token hashes have bit i set than unset. Kept
    as an int array (not packed into a bigint) to dodge sign issues
    and keep hamming distance a zip_with sum.
    """
    htoks = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(htoks)

    def bit_set(i: int):
        return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1

    return F.array(
        *[
            (F.size(F.filter(htoks, bit_set(i))) * 2 > n).cast("int")
            for i in range(nbits)
        ]
    )


def hamming(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0), lambda acc, x: acc + x
    )


def simhash_dedup_pairs(
    docs: DataFrame,
    max_hamming: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = 64,
    bands: int = 8,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= max_hamming.

    Candidates come from matching any of `bands` bit-slices exactly
    (pigeonhole: distance <= bands-1 guarantees a matching band; with
    8 bands this is exact for max_hamming <= 7). Verify = hamming on
    the full bit array.
    """
    width = nbits // bands
    sig = docs.select(
        F.col(id_col).alias("id"), simhash_bits(T.tokens(F.col(text_col)), nbits).alias("bits")
    )
    banded = sig.select(
        "id",
        "bits",
        F.posexplode(
            F.array(*[F.hash(F.slice("bits", b * width + 1, width), F.lit(b)) for b in range(bands)])
        ).alias("band_idx", "band_hash"),
    )
    left, right = banded.alias("l"), banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("doc_id_a"),
            F.col("r.id").alias("doc_id_b"),
            hamming(F.col("l.bits"), F.col("r.bits")).alias("hd"),
        )
        .distinct()
        .filter(F.col("hd") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs (a < b) with cosine similarity >= threshold.

    Brute-force form; at scale feed this the bucketed candidates from
    operators/similarity.py (random-hyperplane LSH) instead of the
    full cross join.
    """
    a = emb.select(F.col(id_col).alias("vec_id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("vec_id_b"), F.col(vec_col).alias("vb"))
    cos = V.cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("vec_id_a", "vec_id_b", F.round("cos", 4).alias("cos"))
    )

"""Benchmark decontamination: flag training documents that share
word n-grams with an evaluation/benchmark corpus.

The canonical pre-training hygiene step (cf. GPT-3 §C / PaLM app.:
13-gram collision scrub): any training document that shares at least
one n-gram with a benchmark document leaks evaluation data and must be
dropped or cleaned.

100 TB posture: the benchmark side is always tiny (benchmarks are
thousands of documents; the training corpus is the 100 TB side), so
the benchmark n-gram set is computed once, deduplicated, and
broadcast; the training side is map-only (tokenize -> shingle ->
explode) into a broadcast semi/inner join — the big side never
shuffles. Grams are compared by 64-bit hash, not string, so the
exploded stream carries 8 bytes per gram instead of the gram text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def _gram_hashes(text: F.Column, n: int) -> F.Column:
    """Distinct xxhash64 over the ' '-joined word n-grams of `text`.

    Documents shorter than n tokens produce no grams (they cannot
    contain a full n-gram). Distinct because contamination is judged
    on the set of shared grams, so duplicates inside one doc are
    noise — and dropping them before the explode shrinks the stream.
    """
    # all_shingles builds the gram strings with chained zip_with over
    # shifted token arrays (one pass), not an index-based transform
    # that re-evaluates the tokenization per position — see the note
    # in functions/text.py::all_shingles. Short docs yield [].
    grams = F.transform(T.all_shingles(text, n), lambda g: F.xxhash64(g))
    return F.array_distinct(grams)


def contaminated_docs(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shared_ngrams) for every training doc sharing >= 1
    word n-gram with the benchmark corpus.

    Join direction: benchmark grams are broadcast (small side by
    construction); the training gram stream stays map-side. The
    output is hit-only — downstream dedup is a left_anti join of the
    corpus against this frame (see :func:`decontaminate`).
    """
    bench_grams = bench.select(
        F.explode(_gram_hashes(F.col(text_col), n)).alias("g")
    ).distinct()
    train_grams = train.select(
        F.col(id_col), F.explode(_gram_hashes(F.col(text_col), n)).alias("g")
    )
    return (
        train_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("shared_ngrams"))
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The training corpus minus contaminated documents."""
    hits = contaminated_docs(train, bench, n=n, id_col=id_col, text_col=text_col)
    return train.join(hits, id_col, "left_anti")


# ---------------------------------------------------------------------------
# bloom-prefiltered variant (the very-large-benchmark scale path)
# ---------------------------------------------------------------------------


def _bloom_bitmap(bench_grams: DataFrame, bits_per_key: int, num_hashes: int):
    """(words, m): a classic Bloom filter over the benchmark gram
    hashes, built WITH Spark expressions so probe-side hashing matches
    bit-for-bit (xxhash64(g, j) — Python has no twin of Spark's
    XXH64).

    Two tiny jobs over the (small by contract) benchmark side: a count
    to size ``m``, and a distinct-positions collect. The bitmap comes
    back as ``m/64`` longs.
    """
    cnt = bench_grams.count()
    m = max(64, 1 << (max(cnt, 1) * bits_per_key - 1).bit_length())
    pos = [F.pmod(F.xxhash64("g", F.lit(j)), F.lit(m)) for j in range(num_hashes)]
    rows = bench_grams.select(F.explode(F.array(*pos)).alias("p")).distinct().collect()
    words = [0] * (m // 64)
    for r in rows:
        p = r["p"]
        words[p >> 6] |= 1 << (p & 63)
    # two's-complement into signed longs for the array<bigint> literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words], m


def _might_contain(bitmap: F.Column, m: int, num_hashes: int, g: F.Column) -> F.Column:
    """All ``num_hashes`` probe bits set — pure codegen'd Column math
    (shift/and over the literal word array), no UDF."""
    cond = F.lit(True)
    for j in range(num_hashes):
        p = F.pmod(F.xxhash64(g, F.lit(j)), F.lit(m))
        word = F.element_at(bitmap, (F.floor(p / 64) + 1).cast("int"))
        cond = cond & (F.getbit(word, F.pmod(p, F.lit(64))) == 1)
    return cond


def bloom_contaminated_docs(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits_per_key: int = 16,
    num_hashes: int = 5,
) -> DataFrame:
    """:func:`contaminated_docs` with a Bloom prefilter on the training
    gram stream — EXACT output (Blooms have no false negatives; the
    surviving grams still pass through the precise benchmark join, so
    false positives die there).

    Why a second variant exists: the broadcast-exact path ships the
    full benchmark gram set to every executor. When the benchmark side
    grows (every eval suite ever published ~ 10⁸ grams ~ 800 MB raw),
    the Bloom is the 16-bits-per-key stand-in (~200 MB) that prunes
    ~everything map-side; the exact verify join then runs over the
    tiny survivor stream, so the full gram set never needs to reach
    the executors as a broadcast — at cluster scale that verify is a
    plain shuffle join of survivors against the gram table, and with
    fpp = 2^-num_hashes only ~fpp of clean grams pay it.

    Here the bitmap travels as ROW DATA in a broadcast one-row frame —
    NOT as an inline array literal: ``F.lit(words)`` plants a
    CreateArray of m/64 long literals that is re-evaluated per probed
    row (measured 8.1 s vs 3.4 s for the exact path at sf0.1); the
    broadcast row materializes the array once and ``element_at`` reads
    it by reference. Past ~1M benchmark grams swap the broadcast row
    for Spark's injected runtime bloom or a scala-UDF ``sc.broadcast``
    — same algebra, documented swap (SCALE.md).
    """
    bench_grams = (
        bench.select(F.explode(_gram_hashes(F.col(text_col), n)).alias("g"))
        .distinct()
        # pinned (r11): consumed by the bitmap build (a driver
        # collect) AND the exact-verify broadcast — one benchmark
        # tokenization instead of two
        .localCheckpoint(eager=False)
    )
    words, m = _bloom_bitmap(bench_grams, bits_per_key, num_hashes)
    spark = train.sparkSession
    bitmap_row = spark.createDataFrame([(words,)], "bm array<bigint>")
    train_grams = train.select(
        F.col(id_col), F.explode(_gram_hashes(F.col(text_col), n)).alias("g")
    )
    survivors = train_grams.crossJoin(F.broadcast(bitmap_row)).filter(
        _might_contain(F.col("bm"), m, num_hashes, F.col("g"))
    )
    return (
        survivors.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("shared_ngrams"))
    )

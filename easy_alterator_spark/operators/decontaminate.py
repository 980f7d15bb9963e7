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
    toks = T.tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, n), " ")))
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


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

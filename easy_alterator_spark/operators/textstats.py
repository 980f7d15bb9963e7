"""Text-analysis operators over the documents table.

Thin DataFrame wrappers around functions/text.py Column expressions:
language-ID (marker-token heuristic), quality scoring, token stats,
and min-hash document fingerprinting. All map-only until the final
aggregation — linear scaling in corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T

# marker tokens per language for the heuristic language-ID; shared
# verbatim with the DuckDB oracle SQL in queries/extensions.py.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "is", "and"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "das"),
}


def _marker_count(toks: F.Column, markers: tuple[str, ...]) -> F.Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predict language from marker-token counts (deterministic
    priority order en > es > de on ties, 'und' when no markers)."""
    toks = T.tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col),
        _marker_count(toks, LANG_MARKERS["en"]).alias("en_cnt"),
        _marker_count(toks, LANG_MARKERS["es"]).alias("es_cnt"),
        _marker_count(toks, LANG_MARKERS["de"]).alias("de_cnt"),
    )
    pred = (
        F.when(
            (F.col("en_cnt") >= F.col("es_cnt"))
            & (F.col("en_cnt") >= F.col("de_cnt"))
            & (F.col("en_cnt") > 0),
            "en",
        )
        .when((F.col("es_cnt") >= F.col("de_cnt")) & (F.col("es_cnt") > 0), "es")
        .when(F.col("de_cnt") > 0, "de")
        .otherwise("und")
    )
    return d.select(id_col, pred.alias("pred_lang"))


def quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc heuristic quality score in [0,1] (see functions/text.py)."""
    return docs.select(F.col(id_col), T.quality_score(F.col(text_col)).alias("quality"))


def token_stats_by(docs: DataFrame, group_col: str, text_col: str = "text") -> DataFrame:
    """Token-count stats per group: total / avg / max tokens."""
    # long, not int: DuckDB len() is BIGINT and its SUM(int) widens to
    # HUGEINT — pinning both sides to 64-bit keeps the differential
    # gate's value-hash type-stable (oracle side pins SUM(..)::BIGINT).
    ntok = T.token_count(F.col(text_col)).cast("long")
    return (
        docs.select(F.col(group_col), ntok.alias("ntok"))
        .groupBy(group_col)
        .agg(
            F.sum("ntok").cast("long").alias("total_tokens"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
            F.max("ntok").alias("max_tokens"),
        )
    )


def repetition_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals per document: duplicate bigram /
    trigram fraction and the top-bigram share. Everything is row-local
    Column math (functions/text.py) — a 100 TB corpus runs this as a
    pure map with zero shuffle."""
    return docs.select(
        F.col(id_col),
        T.dup_ngram_fraction(F.col(text_col), 2).alias("dup_bigram_frac"),
        T.dup_ngram_fraction(F.col(text_col), 3).alias("dup_trigram_frac"),
        T.top_ngram_fraction(F.col(text_col), 2).alias("top_bigram_frac"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus vocabulary: top-k tokens by occurrence count
    (deterministic tie-break on the token string).

    Plan shape for 100 TB: explode -> partial hash agg (map-side
    combine collapses each partition to its distinct tokens before the
    shuffle — the exchange carries at most |vocab| rows per partition,
    not token occurrences) -> final agg -> TakeOrderedAndProject
    (top-k never materializes a global sort).
    """
    tok = docs.select(F.explode(T.tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").cast("long").alias("cnt"))
    return counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)


def corpus_stats_by(
    docs: DataFrame,
    group_col: str = "lang",
    len_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Per-group corpus profile: doc count, distinct sources, and
    exact p50/p90 of document length.

    `percentile` (exact, interpolated) keeps the DuckDB
    `quantile_cont` oracle bit-equal; the 100 TB variant swaps in
    `approx_percentile` / `approx_count_distinct` at the same plan
    shape — single partial+final aggregate, one shuffle on the group
    key."""
    return docs.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct(source_col).cast("long").alias("n_sources"),
        F.round(F.percentile(F.col(len_col), F.lit(0.5)), 2).alias("p50_chars"),
        F.round(F.percentile(F.col(len_col), F.lit(0.9)), 2).alias("p90_chars"),
    )


def min_token_fingerprint(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """1-permutation MinHash fingerprint: min md5 over the distinct
    token set. md5 (not xxhash64) so the DuckDB oracle reproduces it."""
    fp = F.array_min(F.transform(T.distinct_tokens(F.col(text_col)), F.md5))
    return docs.select(F.col(id_col), fp.alias("fp"))


def corpus_entropy_by(
    docs: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-slice lexical-diversity profile: unigram Shannon entropy
    (bits), vocabulary size, token count, and type-token ratio.

    Entropy is the corpus-health number quality dashboards track per
    source/crawl: a slice whose entropy collapses is template spam or
    a scrape loop even when volume looks healthy. Two hash
    aggregations, both map-side combined: (slice, token) counts, then
    the per-slice entropy fold  H = log2(N) - Σ c·log2(c) / N  — the
    algebraic identity avoids materializing p_i = c/N per row first,
    so the second agg is a plain SUM, mergeable at any parallelism.
    """
    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(T.tokens(F.col(text_col))).alias("tok")
    )
    counts = tok.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    log2 = float(__import__("math").log(2.0))
    return (
        counts.groupBy("grp")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab"),
            F.sum(F.col("c") * F.log("c")).alias("clogc"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_tokens",
            "vocab",
            F.round(
                (F.log("n_tokens") - F.col("clogc") / F.col("n_tokens")) / log2, 4
            ).alias("entropy_bits"),
            F.round(F.col("vocab") / F.col("n_tokens"), 6).alias("type_token_ratio"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_doc_frac: float = 0.3,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Template/boilerplate detection: word n-grams present in at
    least ``min_doc_frac`` of a slice's documents —
    (source, gram, df, doc_frac).

    Navigation chrome, cookie banners, and license footers repeat
    VERBATIM across most pages of a site; document-frequency within
    the slice finds them without any parsing. Shape: per-doc distinct
    n-gram explode -> (slice, gram) count (map-side combined) ->
    broadcast per-slice doc totals -> ratio filter. Output is
    template-sized. The removal step is a broadcast anti-join of this
    table against the same shingle stream.
    """
    grams = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("did"),
        F.explode(T.word_shingles(F.col(text_col), n)).alias("gram"),
    )
    df_counts = grams.groupBy("grp", "gram").agg(
        F.count(F.lit(1)).alias("df")
    )  # shingles are per-doc distinct, so count == doc frequency
    totals = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        df_counts.join(F.broadcast(totals), "grp")
        .withColumn("doc_frac", F.round(F.col("df") / F.col("n_docs"), 4))
        .filter(F.col("df") >= F.col("n_docs") * min_doc_frac)
        .select(F.col("grp").alias(group_col), "gram", "df", "doc_frac")
    )

"""Text-analysis Column expressions for the documents table.

Everything here is a pure ``pyspark.sql.functions`` composition — no
Python UDFs in the hot path — so it stays inside whole-stage codegen
and scales linearly with executors. Regexes are kept to portable
character classes so the DuckDB oracle evaluates them identically.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A tiny deterministic stopword list shared with the oracle SQL.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (drops empty tokens)."""
    return F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_tokens(text: Column) -> Column:
    """Deduplicated, sorted token set — the word-shingle set used by
    Jaccard dedup. Sorting makes downstream min-hash/fingerprint
    computations order-independent."""
    return F.array_sort(F.array_distinct(tokens(text)))


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles as ' '-joined strings (sorted distinct set);
    built on :func:`all_shingles` (zip_with form, see its note).
    Short docs (< n tokens) fall back to the whole doc as one shingle.
    """
    toks = tokens(text)
    sh = all_shingles(text, n)
    return F.when(F.size(toks) >= n, F.array_sort(F.array_distinct(sh))).otherwise(
        F.array(F.array_join(toks, " "))
    )


def all_shingles(text: Column, n: int) -> Column:
    """ALL ' '-joined word n-grams (duplicates kept, order kept) —
    the multiset :func:`word_shingles` deduplicates. Docs shorter
    than n tokens yield an empty array."""
    toks = tokens(text)
    # Sliding windows via chained zip_with against shifted copies of
    # the token array — NOT transform(sequence(...), i -> slice(toks,
    # i+1, n)): an index-based lambda re-evaluates the inlined
    # tokenization subtree per POSITION (HOF lambdas are interpreted,
    # projections collapse), turning shingling O(len^2). Here each
    # shifted copy is materialized once per row; trailing windows that
    # run off the end concat with null and are filtered (concat
    # propagates null). 3.2 s -> 0.46 s over sf0.1 documents.
    sh = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(0)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(sh, lambda x: x.isNotNull())


def dup_ngram_fraction(text: Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier
    n-gram in the same document: 1 - distinct/total. The Gopher-style
    repetition signal (Rae et al. 2021 table A1) — high values mean
    boilerplate/looping text. Row-local (no shuffle): the whole
    expression runs inside the scan projection."""
    sh = all_shingles(text, n)
    return F.when(
        F.size(sh) > 0,
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / F.size(sh), 4
        ),
    ).otherwise(F.lit(0.0))


def top_ngram_fraction(text: Column, n: int) -> Column:
    """Share of n-gram occurrences taken by the single most frequent
    n-gram of the document (Gopher's top-ngram-fraction filter).
    Computed row-locally with a sort + longest-run fold — no
    per-document groupBy, no shuffle."""
    sh = F.array_sort(all_shingles(text, n))
    # longest run of equal adjacent values in the sorted array:
    # aggregate state (prev, run, best)
    best = F.aggregate(
        sh,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(
        F.size(sh) > 0, F.round(best.cast("double") / F.size(sh), 4)
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(toks) > 0, stop.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    """Share of characters that are ASCII letters or space."""
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, "[^a-zA-Z ]", ""))
    return F.when(n > 0, alpha.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: balanced length, alpha share, and a
    mild stopword presence signal (real text has function words)."""
    toks = token_count(text)
    len_score = F.least(toks.cast("double") / F.lit(50.0), F.lit(1.0))
    return F.round(
        0.5 * len_score + 0.3 * alpha_ratio(text) + 0.2 * F.least(stopword_ratio(text) * 5, F.lit(1.0)),
        4,
    )


# PII patterns kept to portable regex constructs (character classes,
# bounded repetition, \b) so Spark's Java regex and the oracle's RE2
# match identically.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def redact_pii(text: Column) -> Column:
    """Replace emails/phone numbers with typed placeholders — the
    pre-training scrub step. Pure regexp_replace chain: row-local,
    codegen'd, pushdown-friendly."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: lowercase, collapse whitespace,
    md5. Exact-dup detection at 100 TB = groupBy(fingerprint) — the
    shuffle key is 32 bytes regardless of document size."""
    canon = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(canon)


# GPT-2-style pre-tokenizer shape (Radford et al. 2019), restricted to
# lookahead-free portable constructs so Spark's Java regex and the
# oracle's RE2 agree: contraction suffixes, space-prefixed word/number
# runs (numbers chunked <=3 digits as modern BPE vocabularies do), and
# punctuation runs.
BPE_SPLIT_RE = r"'[a-zA-Z]+| ?[a-zA-Z]+| ?[0-9]{1,3}| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(text: Column) -> Column:
    """Pre-tokenizer token count — the unit that LLM token budgets are
    measured in (whitespace words under-count by the punctuation and
    contraction splits). One regexp_count, row-local, codegen'd."""
    return F.regexp_count(text, F.lit(BPE_SPLIT_RE))

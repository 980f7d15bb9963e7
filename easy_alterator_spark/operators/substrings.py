"""Substring-level duplication: the ExactSubstr family (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", 2022).

Document-level dedup (exact / MinHash / SimHash — operators/dedup.py)
misses the common failure mode of web corpora: two mostly-different
pages sharing a long boilerplate span (licenses, navigation chrome,
quoted posts). The reference treatment builds a corpus-wide suffix
array and removes every repeated span >= 50 tokens; a suffix array is
a single giant sorted structure and does not decompose onto executors,
so the Spark-native re-expression is *fixed-width token windows with
stride 1*: a repeated span of length >= L + w - 1 tokens is guaranteed
to produce >= L shared w-token windows, so per-document "fraction of
windows that also occur in another document" is a faithful, sharded
stand-in for "fraction of the document inside a repeated span".

100 TB posture (this is the whole design):

- Window extraction is row-local (tokenize -> slice -> xxhash64),
  reusing the n-gram machinery from operators/decontaminate.py. The
  exploded stream carries (doc_id, 8-byte window hash) — never window
  text.
- Cross-doc counting is ONE hash-partitioned shuffle on the window
  hash: a window function `count(*) over (partition by g)` tags every
  occurrence with its corpus-wide document count in the same exchange
  that a groupBy would need, with no join-back of the big stream
  (groupBy + re-join would shuffle the occurrence stream twice).
  Window hashes are uniform, so partitions balance at any corpus
  size; a pathological mega-gram (appears in ~every doc) concentrates
  one hash cell — the documented swap is pre-aggregating per
  (g, salt) and summing, but real w >= 8 windows never approach that.
- The per-doc rollup shuffles only (doc_id, flag) pairs.

No stage is quadratic and nothing is collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .decontaminate import _gram_hashes


def window_occurrences(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, g): one row per DISTINCT w-token window per document.

    Distinct-per-doc so that a document internally repeating its own
    boilerplate does not inflate its cross-doc counts: duplication is
    judged corpus-wide, and within-doc repetition is a different
    signal (operators/textstats.py repetition_metrics).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_gram_hashes(F.col(text_col), w)).alias("g"),
    )


def window_dup_stats(
    docs: DataFrame, w: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document duplicated-window profile:
    (doc_id, n_win, dup_win, dup_frac).

    - ``n_win``: distinct w-token windows in the doc (docs shorter
      than w tokens have none and are absent from the output);
    - ``dup_win``: how many of those also occur in >= 1 OTHER doc;
    - ``dup_frac``: dup_win / n_win — the ExactSubstr removal signal.

    Two shuffles total: the per-window corpus count (window function
    over the gram hash) and the per-doc rollup. See module docstring
    for why this beats groupBy-then-join at scale.
    """
    occ = window_occurrences(docs, w=w, id_col=id_col, text_col=text_col)
    # occ is distinct per (doc, g), so count(*) over g = #docs with g
    nd = F.count("*").over(Window.partitionBy("g"))
    tagged = occ.select("doc_id", (nd >= 2).cast("int").alias("is_dup"))
    return tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_win"),
        F.sum("is_dup").cast("long").alias("dup_win"),
        F.round(F.sum("is_dup") / F.count("*"), 4).alias("dup_frac"),
    )


def drop_duplicated_docs(
    docs: DataFrame,
    w: int = 8,
    max_dup_fraction: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The corpus minus documents whose duplicated-window fraction
    exceeds ``max_dup_fraction`` — the document-granular ExactSubstr
    action (span-granular cutting needs the token positions back,
    which is a rebuild like operators/dedup.py chunk dedup; dropping
    the mostly-duplicated document is the standard first-line policy).

    Docs shorter than w tokens carry no windows, hence no evidence of
    duplication, and are KEPT (left_anti on the flagged set).
    """
    flagged = window_dup_stats(docs, w=w, id_col=id_col, text_col=text_col).filter(
        F.col("dup_frac") > max_dup_fraction
    )
    return docs.join(
        flagged.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )

"""N-gram language-model quality scoring (CCNet/KenLM-style filter).

The classic LLM-corpus quality gate scores each document by its
perplexity under a small n-gram LM; high-perplexity documents (gibberish,
boilerplate, wrong-language text) are dropped. This module implements the
distributed form: train add-k-smoothed bigram statistics over a corpus as
plain aggregations, then score documents with joins against the count
tables — everything stays in `pyspark.sql.functions`, no Python in the
hot path.

Scale (100 TB): the bigram count table is one shuffle on (w1, w2) with
full map-side partial aggregation; scoring re-shuffles the token stream
on the same key, so both sides hash-partition identically and AQE can
coalesce. When the model vocabulary is capped (`top-V` words + one OOV
bucket — the standard KenLM deployment), the count table collapses to
(V+1)^2 worst-case rows and broadcasts, making scoring map-only: that
swap is implemented as :func:`capped_bigram_model` +
:func:`lm_score_capped` (broadcast-joins-only, plan-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def doc_bigrams(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram stream ``(id, w1, w2)``.

    Bigram construction is row-local (zip of the token array with its
    own tail) — zero shuffle, stays in whole-stage codegen. Documents
    with fewer than two tokens contribute no rows.
    """
    toks = docs.select(
        F.col(id_col), T.tokens(F.col(text_col)).alias("ts")
    ).filter(F.size("ts") >= 2)
    n1 = F.greatest(F.size("ts") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice("ts", 1, n1),
        F.slice(F.col("ts"), 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return toks.select(id_col, F.explode(pairs).alias("bg")).select(
        id_col, "bg.w1", "bg.w2"
    )


def bigram_model(bigrams: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model: ``(counts, contexts, vocab)``.

    * counts — ``(w1, w2, c)``: one aggregation, map-side combined.
    * contexts — ``(w1, cw)``: derived from counts (already collapsed),
      so the second shuffle moves the distinct-bigram table, not the
      token stream.
    * vocab — single row ``(v)``: distinct token count for add-k
      smoothing, cross-broadcast into scoring.

    100 TB swap: cap to the top-V most frequent w1 contexts and bucket
    everything else as OOV; counts then broadcasts and scoring becomes
    map-only.
    """
    counts = bigrams.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c")
    )
    contexts = counts.groupBy("w1").agg(F.sum("c").alias("cw"))
    vocab = (
        bigrams.select(F.col("w1").alias("w"))
        .union(bigrams.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    return counts, contexts, vocab


def lm_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Self-scored corpus perplexity proxy: per document, the average
    negative log-likelihood of its bigrams under the add-k-smoothed
    model trained on the whole corpus.

    Output: ``(id, n_bigrams, avg_nll)`` — higher avg_nll = less like
    the corpus = lower quality. Joining the token stream back onto the
    count tables shuffles on (w1, w2) then (w1); the final per-document
    average shuffles on the id. All three aggregations are algebraic.
    """
    # pinned (r11): the bigram stream feeds the count aggregate, both
    # vocab union sides, and the scoring join-back — four consumers
    # that each re-tokenized the corpus (the tokenize-once
    # materialization every LM-data pipeline performs)
    bi = doc_bigrams(docs, text_col, id_col).localCheckpoint(eager=False)
    counts, contexts, vocab = bigram_model(bi)
    nll = -F.log((F.col("c") + k) / (F.col("cw") + k * F.col("v")))
    return (
        bi.join(counts, ["w1", "w2"])
        .join(contexts, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 4).alias("avg_nll"),
        )
    )


def lm_score_against(
    model_counts: DataFrame,
    model_contexts: DataFrame,
    model_vocab: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Score NEW documents against a previously trained model (the
    deployment shape: train once on a trusted slice, gate every
    incoming batch). Unseen bigrams back off to the smoothing floor
    k / (cw + k·v); unseen contexts to k / (k·v) — both via left joins
    with zero-coalesced counts, so out-of-model text scores high
    instead of erroring.
    """
    bi = doc_bigrams(docs, text_col, id_col)
    joined = (
        bi.join(model_counts, ["w1", "w2"], "left")
        .join(model_contexts, ["w1"], "left")
        .crossJoin(F.broadcast(model_vocab))
        .select(
            id_col,
            F.coalesce("c", F.lit(0.0)).alias("c"),
            F.coalesce("cw", F.lit(0.0)).alias("cw"),
            "v",
        )
    )
    nll = -F.log((F.col("c") + k) / (F.col("cw") + k * F.col("v")))
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(nll), 4).alias("avg_nll"),
    )


def top_collocations(
    docs: DataFrame,
    k: int = 30,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information:
    PMI(a,b) = ln(N·c(a,b) / (c(a)·c(b))) over the corpus bigram
    stream, where N is the total bigram count and c(a)/c(b) are the
    word's occurrences as left/right context respectively.

    The corpus-analysis staple for finding multi-word expressions
    ("new york", "machine learning") worth merging before tokenizer
    training. ``min_count`` drops rare-pair noise (PMI is maximized by
    hapax pairs). Shapes: the bigram count is one map-combined
    aggregation; left/right marginals are second-level aggregates of
    the already-collapsed count table; N is a one-row broadcast; top-k
    is TakeOrdered — nothing rescans the corpus.
    """
    bi = doc_bigrams(docs, text_col, id_col)
    counts = (
        bi.groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("c"))
        # pinned (r11): marginals, total, and the min_count filter all
        # read this collapsed table — one corpus tokenization
        .localCheckpoint(eager=False)
    )
    left = counts.groupBy("w1").agg(F.sum("c").alias("c1"))
    right = counts.groupBy("w2").agg(F.sum("c").alias("c2"))
    total = counts.agg(F.sum("c").alias("n"))
    return (
        counts.filter(F.col("c") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1", "w2", F.col("c").cast("long").alias("pair_count"),
            F.round(
                F.log(F.col("n") * F.col("c") / (F.col("c1") * F.col("c2"))), 4
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


OOV = "\x00oov"  # impossible token (tokens never contain \x00-prefixed words)


def capped_bigram_model(
    bigrams: DataFrame, top_v: int = 4096
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the deployment-shape model: vocabulary capped to the
    ``top_v`` most frequent words (by total occurrence in either
    bigram position, ties -> lexicographic), everything else folded
    into one OOV bucket.

    The count table is then at most (V+1)^2 rows — broadcastable at
    any corpus size — so :func:`lm_score_capped` scores with
    broadcast joins only: the 100 TB corpus pass is scan + map, no
    shuffle of the token stream at all. The vocab row counts the
    capped alphabet (V+1 with OOV), keeping add-k smoothing proper.
    """
    occ = (
        bigrams.select(F.col("w1").alias("w"))
        .unionAll(bigrams.select(F.col("w2").alias("w")))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "w")
        .limit(top_v)
        .select("w")
    )
    folded = (
        bigrams.join(
            F.broadcast(occ.withColumnRenamed("w", "k1")),
            F.col("w1") == F.col("k1"), "left")
        .join(
            F.broadcast(occ.withColumnRenamed("w", "k2")),
            F.col("w2") == F.col("k2"), "left")
        .select(
            F.coalesce("k1", F.lit(OOV)).alias("w1"),
            F.coalesce("k2", F.lit(OOV)).alias("w2"),
        )
    )
    counts = folded.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c")
    )
    contexts = counts.groupBy("w1").agg(F.sum("c").alias("cw"))
    vocab = counts.select("w1").union(counts.select("w2")).agg(
        F.count_distinct("w1").cast("double").alias("v")
    )
    return counts, contexts, vocab


def lm_score_capped(
    model_counts: DataFrame,
    model_contexts: DataFrame,
    model_vocab: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
) -> DataFrame:
    """Score documents against a capped-vocabulary model with
    BROADCAST joins only — the corpus side never shuffles until the
    per-document average (which groups on the id the bigram stream
    already carries; at 100 TB that final agg is the only exchange,
    and it's map-combined).

    Out-of-vocab words fold into the OOV bucket BEFORE the lookups,
    so every bigram hits the (V+1)^2 table; genuinely-unseen OOV
    transitions still back off to the smoothing floor.
    """
    vocab_words = model_counts.select(F.col("w1").alias("w")).union(
        model_counts.select(F.col("w2").alias("w"))
    ).filter(F.col("w") != OOV).distinct()
    bi = doc_bigrams(docs, text_col, id_col)
    folded = (
        bi.join(
            F.broadcast(vocab_words.withColumnRenamed("w", "k1")),
            bi["w1"] == F.col("k1"), "left")
        .join(
            F.broadcast(vocab_words.withColumnRenamed("w", "k2")),
            bi["w2"] == F.col("k2"), "left")
        .select(
            id_col,
            F.coalesce("k1", F.lit(OOV)).alias("w1"),
            F.coalesce("k2", F.lit(OOV)).alias("w2"),
        )
    )
    joined = (
        folded.join(F.broadcast(model_counts), ["w1", "w2"], "left")
        .join(F.broadcast(model_contexts), ["w1"], "left")
        .crossJoin(F.broadcast(model_vocab))
        .select(
            id_col,
            F.coalesce("c", F.lit(0.0)).alias("c"),
            F.coalesce("cw", F.lit(0.0)).alias("cw"),
            "v",
        )
    )
    nll = -F.log((F.col("c") + k) / (F.col("cw") + k * F.col("v")))
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(nll), 4).alias("avg_nll"),
    )

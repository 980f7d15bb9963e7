"""BPE tokenizer training on the corpus — the merge-table learner a
training-data pipeline runs before any token-budget decision
(packing, chunking, pricing) can be made with the tokenizer that will
actually train the model.

Shape discipline (v2, VERDICT r3 task 2): the CORPUS is touched
exactly once — one explode + hash-aggregate to the (word, count)
vocabulary. That vocabulary is then collected ONCE (capped at
``max_vocab`` types by frequency — the same bounded-broadcast fold as
lm_score's capped_bigram_model) and the merge loop runs entirely
in-process, the classic Sennrich trainer: incremental pair counts, so
each round touches only the words that actually contain the merged
pair. A production 30-50k-merge train is therefore ONE Spark job (the
corpus aggregate) plus a driver computation over a table that fits in
driver memory even at 10M types — not tens of thousands of scheduled
one-row-argmax jobs (the v1 shape this replaces; it scheduled
2 × num_merges Spark jobs and rebuilt the vocab plan every round).

``bpe_segment`` stays distributed: the per-word merge fold
(:func:`_merge_pair`) is a pure Column expression applied to
vocab-sized tables; a corpus is segmented by joining its vocab's
segmentation back, never by folding per corpus row.

Semantics match the classic Sennrich et al. BPE trainer: count
adjacent symbol pairs weighted by word frequency (overlapping
occurrences count), merge the most frequent pair greedily
left-to-right without overlap ('aaa' + merge(a,a) -> ['aa','a']),
ties broken lexicographically on (left, right) so training is
deterministic. No end-of-word marker (documented divergence; add one
by appending it to the initial symbol split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import text as T


def _merge_pair(syms: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping replacement of the
    adjacent pair (left, right) with their concatenation — the BPE
    merge step as a struct-accumulator fold. At 1M-vocab scale run
    the identical logic inside applyInPandas over the vocab table."""
    merged = left + right

    def step(acc: F.Column, s: F.Column) -> F.Column:
        take = (acc["pend"] == left) & (s == right)
        return (
            F.when(
                acc["pend"].isNull(),
                F.struct(acc["out"].alias("out"), s.alias("pend")),
            )
            .when(
                take,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(acc["pend"])).alias("out"),
                    s.alias("pend"),
                )
            )
        )

    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )
    return F.aggregate(
        syms,
        init,
        step,
        lambda acc: F.when(acc["pend"].isNull(), acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"]))
        ),
    )


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt): corpus word frequencies — the single corpus-sized
    pass of BPE training (map-side combined hash aggregate)."""
    return (
        docs.select(F.explode(T.tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (a, b) — the
    in-process twin of :func:`_merge_pair` ('aaa' + (a,a) -> [aa, a])."""
    merged = a + b
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    docs: DataFrame,
    num_merges: int = 20,
    text_col: str = "text",
    max_vocab: int = 1_000_000,
) -> DataFrame:
    """(rank, left, right, merged, freq): the learned merge table, in
    training order. Stops early when no adjacent pair remains.

    One Spark job (the corpus word-frequency aggregate), then the
    merge loop runs in-process on the collected vocabulary — capped at
    ``max_vocab`` types by (frequency desc, word) for a deterministic
    bound. The cap is an approximation with the same contract as
    lm_score's capped vocabulary: dropped tail types (each rarer than
    every kept type) stop contributing pair counts. At web scale a
    10M-type vocab of (word, count) rows is ~hundreds of MB in driver
    memory; the merge loop updates pair counts incrementally, touching
    only words that contain the merged pair, so 50k merge rounds are
    pure driver CPU — zero additional Spark jobs.

    Tie-breaks match the v1 distributed argmax exactly: highest
    freq, then lexicographically smallest (left, right) — Python tuple
    compare equals Spark's (desc freq, asc a, asc b) ordering for the
    code-point strings ``T.tokens`` emits.
    """
    spark = docs.sparkSession
    rows = (
        word_vocab(docs, text_col)
        .orderBy(F.desc("cnt"), "w")
        .limit(max_vocab)
        .collect()
    )
    # split("w", "") in the v1 Spark form == list(w): per-code-point
    vocab: list[tuple[list[str], int]] = [(list(r["w"]), int(r["cnt"])) for r in rows]

    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, cnt) in enumerate(vocab):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + cnt
            where.setdefault(p, set()).add(idx)

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        live = [(p, c) for p, c in counts.items() if c > 0]
        if not live:
            break
        (a, b), freq = min(live, key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, freq))
        # rewrite ONLY the words that contain (a, b); subtract each
        # affected word's old pair contributions, merge, re-add.
        # where[] entries can be stale (pair already merged away) —
        # the subtract/re-add then nets to zero, which is correct.
        for idx in where.pop((a, b), set()):
            syms, cnt = vocab[idx]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) - cnt
            new_syms = _merge_word(syms, a, b)
            vocab[idx] = (new_syms, cnt)
            for i in range(len(new_syms) - 1):
                p = (new_syms[i], new_syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
                where.setdefault(p, set()).add(idx)
        counts.pop((a, b), None)

    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, freq long"
    )


def bpe_segment(words: DataFrame, merges: list[tuple[str, str]], word_col: str = "w") -> DataFrame:
    """Apply a trained merge list to segment words: (w, pieces). The
    merge list is applied in rank order (each is one fold); intended
    for vocab-sized tables — segment a corpus by joining ITS vocab's
    segmentation back, never by folding per corpus row."""
    syms = F.split(F.col(word_col), "")
    for left, right in merges:
        syms = _merge_pair(syms, left, right)
    return words.select(F.col(word_col), syms.alias("pieces"))

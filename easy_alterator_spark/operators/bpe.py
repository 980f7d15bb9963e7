"""BPE tokenizer training on the corpus — the merge-table learner a
training-data pipeline runs before any token-budget decision
(packing, chunking, pricing) can be made with the tokenizer that will
actually train the model.

Shape discipline: the CORPUS is touched exactly once — one
explode + hash-aggregate to the (word, count) vocabulary. Every merge
round after that runs on the vocabulary table, which is
vocab-bounded (≤ a few million rows at web scale, thousands here) and
independent of corpus row count; the driver loop is over MERGE RANKS,
never data, and each round collects exactly one row (the argmax
pair — same witness discipline as connected_components). Lineage is
truncated per round with localCheckpoint so 50 rounds don't build a
50-deep plan.

The pair-merge rewrite is a pure Column fold (F.aggregate with a
struct accumulator): interpreted per symbol, but the total work is
vocab × word-length per round — at a 1M-word vocabulary swap the same
fold body into applyInPandas over the vocab table (Arrow-batched,
same semantics) as documented on :func:`_merge_pair`.

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


def _adjacent_pairs(syms: F.Column) -> F.Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words). The shifted copy is materialized once per row (zip_with
    against slice), never via index lambdas — see functions/text.py's
    HOF note."""
    shifted = F.concat(
        F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(1))),
        F.array(F.lit(None).cast("string")),
    )
    return F.filter(
        F.zip_with(syms, shifted, lambda a, b: F.struct(a.alias("a"), b.alias("b"))),
        lambda p: p["b"].isNotNull(),
    )


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


def bpe_train(
    docs: DataFrame, num_merges: int = 20, text_col: str = "text"
) -> DataFrame:
    """(rank, left, right, merged, freq): the learned merge table, in
    training order. Stop early when no adjacent pair remains."""
    spark = docs.sparkSession
    vocab = word_vocab(docs, text_col).select(
        "cnt", F.split("w", "").alias("syms")
    ).localCheckpoint()

    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        top = (
            vocab.select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], top[0]["freq"]
        merges.append((rank, a, b, a + b, freq))
        vocab = vocab.select(
            "cnt", _merge_pair(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()

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

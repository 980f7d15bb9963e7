"""Multinomial Naive Bayes over token streams — the fastText-shaped
document classifier a training-data pipeline runs for domain / quality
/ language labeling, expressed as two aggregations and one broadcast
join.

Training IS aggregation: per-(label, token) occurrence counts and
per-label totals are algebraic aggregates (map-side combined), so
"fit" costs one pass over the labeled slice regardless of corpus
size. The fitted model is vocabulary × classes rows — broadcastable
for any real vocabulary cap (pair with the top-V + OOV folding trick
in operators/lm_score.capped_bigram_model when vocabulary is open).
Scoring is then map-only per token occurrence: explode -> broadcast
hash join against the model -> one hash aggregation keyed on
(doc, label); the corpus never shuffles except on doc_id for the
final per-doc sum, and that agg is partially combined map-side.

Out-of-vocabulary test tokens are IGNORED (standard bag-of-words
scoring contract; the alternative — a per-class unseen floor — is a
one-line swap documented on `nb_score`). Ties in the argmax break on
label ascending, so predictions are deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as T


def nb_model(
    train: DataFrame, label_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """(label, tok, logp, logprior): add-1-smoothed multinomial NB.

    logp(tok|label) = ln((cnt + 1) / (n_tok_label + V)) over the FULL
    label × vocabulary grid (zero-count cells get the smoothing mass),
    V = train vocabulary size. logprior = ln(docs_label / docs_total)
    rides on every row so scoring needs a single broadcast.
    """
    toks = train.select(
        F.col(label_col).alias("label"),
        F.explode(T.tokens(F.col(text_col))).alias("tok"),
    )
    counts = toks.groupBy("label", "tok").agg(F.count(F.lit(1)).alias("cnt"))
    class_tot = toks.groupBy("label").agg(F.count(F.lit(1)).alias("n_tok"))
    vocab = counts.select("tok").distinct()
    v_size = vocab.agg(F.count(F.lit(1)).alias("v"))
    docs_per = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    docs_tot = train.agg(F.count(F.lit(1)).alias("total_docs"))
    grid = (
        class_tot.crossJoin(vocab)  # classes × vocab — model-sized
        .join(counts, ["label", "tok"], "left")
        .crossJoin(F.broadcast(v_size))
    )
    return (
        grid.select(
            "label",
            "tok",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
                / (F.col("n_tok") + F.col("v"))
            ).alias("logp"),
        )
        .join(
            F.broadcast(
                docs_per.crossJoin(F.broadcast(docs_tot)).select(
                    "label",
                    F.log(F.col("n_docs") / F.col("total_docs")).alias("logprior"),
                )
            ),
            "label",
        )
    )


def nb_score(
    test: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pred_label, score): argmax label per test document.

    score = logprior + Σ_occurrences logp(tok|label), summed over every
    in-vocabulary token OCCURRENCE (multinomial tf weighting falls out
    of summing per occurrence — no separate tf aggregation needed).
    To swap in an unseen-token floor instead of the ignore contract,
    left-join and coalesce logp to -ln(n_tok_label + V) per label.
    """
    occ = test.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("tok"),
    )
    scored = (
        occ.join(F.broadcast(model), "tok")
        .groupBy("doc_id", "label")
        .agg((F.first("logprior") + F.sum("logp")).alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("label").alias("pred_label"),
            F.round("score", 3).alias("score"),
        )
    )

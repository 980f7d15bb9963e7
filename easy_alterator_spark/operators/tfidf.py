"""TF-IDF term scoring over the documents table.

The classic IR weighting (Salton & Buckley 1988) as a pure DataFrame
pipeline — the keyword-extraction / topic-signal step of a training
data pipeline ("what is this document about", corpus-level term
salience, boilerplate term discovery).

Plan shape (the one that survives 100 TB):

- term frequencies: explode(tokens) -> groupBy(doc, term). Partial
  aggregation runs map-side, so the shuffle carries (doc, term)
  partial counts, not raw token occurrences.
- document frequencies: ONE more aggregation over the tf table
  (rows are already unique per (doc, term), so ``count(*)`` per term
  IS the document frequency — no count_distinct shuffle).
- corpus size N: a 1-row aggregate, broadcast past the big side via
  cross join (never collected to the driver).
- the tf ⋈ df join shuffles on term; heavy-hitter terms (stopwords)
  are exactly the AQE skew-join case, and the df side is
  |vocabulary|-sized — orders smaller than the corpus.

No UDFs anywhere; ln() and the ratio run inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def term_frequencies(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf): whitespace-token counts per document."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(T.tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tfidf(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf, df, score): score = tf * ln(N / df).

    ``df`` (document frequency) and ``N`` come from the same corpus as
    ``docs`` — restrict the input first to scope the statistics.
    """
    tf = term_frequencies(docs, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4
            ).alias("score"),
        )
    )


def top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by TF-IDF (ties -> lexicographic term).

    Output: (doc_id, term, rank, score). The per-document window is
    tiny (vocabulary of one document), so the only data-scale work is
    the tf/df aggregation above.
    """
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        tfidf(docs, id_col, text_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "rank", "score")
    )

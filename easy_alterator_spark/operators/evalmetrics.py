"""Classification evaluation metrics from a (gold, pred) pair table:
per-class support, precision, recall, F1.

Model-quality rollups belong IN the engine when classifiers run in
the pipeline (operators/nbayes.py, textstats.lang_id gate admission
and routing decisions): computing the report where the predictions
already live avoids exporting per-document predictions to a driver
tool. Everything is aggregate algebra over the confusion matrix —
three tiny groupBys on a table whose size is (classes²), never the
corpus; the corpus-sized work is the single groupBy that builds the
matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(
    df: DataFrame, gold_col: str, pred_col: str
) -> DataFrame:
    """(gold, pred, n) — one corpus-sized aggregate."""
    return df.groupBy(
        F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))


def classification_report(
    df: DataFrame, gold_col: str, pred_col: str
) -> DataFrame:
    """Per-class report over (gold, pred) rows: cls, support (gold
    count), pred_total, tp, precision, recall, f1 (rounded 4,
    zero-division → 0.0). Classes are the union of gold and predicted
    labels, so a class the model never predicts (recall 0) and a
    hallucinated label (support 0) both appear."""
    cm = confusion_matrix(df, gold_col, pred_col)
    g = cm.groupBy(F.col("gold").alias("cls")).agg(
        F.sum("n").alias("support")
    )
    p = cm.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").alias("pred_total")
    )
    t = (
        cm.filter(F.col("gold") == F.col("pred"))
        .groupBy(F.col("gold").alias("cls"))
        .agg(F.sum("n").alias("tp"))
    )
    rep = (
        g.join(p, "cls", "full_outer")
        .join(t, "cls", "left")
        .select(
            "cls",
            F.coalesce("support", F.lit(0)).alias("support"),
            F.coalesce("pred_total", F.lit(0)).alias("pred_total"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    prec = F.when(
        F.col("pred_total") > 0, F.col("tp") / F.col("pred_total")
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("support") > 0, F.col("tp") / F.col("support")
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, 2 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return rep.select(
        "cls",
        "support",
        "pred_total",
        "tp",
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(f1, 4).alias("f1"),
    )

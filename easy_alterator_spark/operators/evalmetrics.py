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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fg4(c: Column) -> Column:
    """Floor-grid to 4 dp: floor(x*1e4)/1e4 is pure IEEE arithmetic,
    identical in every engine, unlike ROUND whose HALF_UP (Spark
    BigDecimal) vs C round (DuckDB) disagree on halfway doubles —
    the derived ratios here (tp/total quotients) are off-grid."""
    return F.floor(c * 10000) / 10000


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
    count), pred_total, tp, precision, recall, f1 (floor-grid 4 dp,
    zero-division → 0.0). Classes are the union of gold and predicted
    labels, so a class the model never predicts (recall 0) and a
    hallucinated label (support 0) both appear.

    NOTE metric displays TRUNCATE toward zero on a 1e-4 grid (floor,
    not round-half-up): recall 2/3 reads 0.6666, where sklearn-style
    rounding would show 0.6667 — the last digit is a floor, chosen
    for bit-identical cross-engine reproducibility."""
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
        _fg4(prec).alias("precision"),
        _fg4(rec).alias("recall"),
        _fg4(f1).alias("f1"),
    )


def cohens_kappa(df: DataFrame, gold_col: str, pred_col: str) -> DataFrame:
    """One-row (n, po, pe, kappa): Cohen's kappa of predictions vs
    gold — chance-corrected agreement, the number that exposes a
    classifier coasting on class imbalance (a 95%-majority-class
    corpus gives accuracy 0.95 to a constant predictor; kappa gives
    it 0.0).

    po = observed agreement (accuracy), pe = Σ_cls (gold marginal ×
    pred marginal) / n² (chance agreement), kappa = (po − pe) /
    (1 − pe); the degenerate pe = 1 case (both raters constant)
    reports 0.0 by convention. Same scale shape as the report: ONE
    corpus-sized aggregate builds the confusion matrix, everything
    after is classes²-sized algebra. po/pe are floor-gridded for
    display; kappa is computed from the ungridded values. As in
    classification_report, displayed values TRUNCATE to the 1e-4
    grid (floor, not round-half-up) — don't read the last digit as
    a rounding.
    """
    cm = confusion_matrix(df, gold_col, pred_col)
    s = cm.agg(
        F.sum("n").cast("double").alias("n"),
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("n")).otherwise(0))
        .cast("double")
        .alias("agree"),
    )
    g = cm.groupBy(F.col("gold").alias("cls")).agg(
        F.sum("n").cast("double").alias("sup")
    )
    p = cm.groupBy(F.col("pred").alias("cls")).agg(
        F.sum("n").cast("double").alias("pt")
    )
    m = (
        g.join(p, "cls", "full_outer")
        .select(
            F.coalesce("sup", F.lit(0.0)).alias("sup"),
            F.coalesce("pt", F.lit(0.0)).alias("pt"),
        )
        .agg(F.sum(F.col("sup") * F.col("pt")).alias("pep"))
    )
    po = F.col("agree") / F.col("n")
    pe = F.col("pep") / (F.col("n") * F.col("n"))
    return s.crossJoin(m).select(
        F.col("n").cast("long").alias("n"),
        _fg4(po).alias("po"),
        _fg4(pe).alias("pe"),
        _fg4(
            F.when(1.0 - pe > 0, (po - pe) / (1.0 - pe)).otherwise(0.0)
        ).alias("kappa"),
    )

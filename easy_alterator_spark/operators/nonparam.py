"""Nonparametric two-sample statistics, integer-exact.

Kolmogorov-Smirnov and Mann-Whitney U between two labelled samples of
one numeric column — the standard drift screens between corpus
snapshots or traffic slices (no binning choice, unlike PSI;
distribution-free, unlike the t-test).

Both are built on the same decomposition: aggregate to per-DISTINCT-
value counts ``(c1, c2)``, then run ONE ordered cumulative sum over
the distinct-value table. Everything up to the final statistic stays
in int64 — ``D = max|cum1*n2 - cum2*n1| / (n1*n2)`` and the doubled
rank sum ``2*R1 = SUM(c1 * (2*cumt - t + 1))`` are exact integers —
so cross-engine results are bit-identical and the only float is one
IEEE division of exactly-representable integers.

Edge semantics: if one sample is empty the integer outputs stay exact
(counts and d_scaled/u1_x2 of 0) and the ratio statistics (d_stat,
auc) are NULL — Spark's non-ANSI divide-by-zero — for the caller to
gate; if both are empty the result is zero rows.

Scale shape: the cumsum runs over DISTINCT values (vocabulary-sized,
not data-sized) and is executed through
``operators/rank.global_prefix_sum`` — the terasort decomposition
(range-partition on the distinct value, local running sums, broadcast
per-partition offsets) — so even a data-sized distinct-value universe
never funnels through one reducer; the distinct values are unique per
row, so range boundaries cannot split ties and the running sums are
bit-identical to the single-window SQL form on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rank import global_prefix_sum


def _value_counts(
    df: DataFrame, value_col: str, group_col: str, a: str, b: str
) -> DataFrame:
    """Per-distinct-value counts (c1, c2) for the two samples."""
    if value_col not in df.columns or group_col not in df.columns:
        raise ValueError(f"need columns {value_col!r}, {group_col!r}")
    g = F.col(group_col)
    # NULL values are excluded: a NULL forms its own count group and
    # Spark's ASC window orders NULLs first while DuckDB orders them
    # last, so the cumsum (and hence D / U) would silently diverge —
    # and an ECDF step at NULL is meaningless anyway. The oracles
    # carry the matching WHERE value IS NOT NULL.
    return (
        df.filter(g.isin(a, b) & F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("__v"))
        .agg(
            F.sum(F.when(g == a, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(g == b, 1).otherwise(0)).alias("c2"),
        )
    )


def ks_2samp(
    df: DataFrame, value_col: str, group_col: str, a: str, b: str
) -> DataFrame:
    """Two-sample KS distance: one row ``(n1, n2, d_scaled, d_stat,
    ks_at)`` where ``d_stat = d_scaled/(n1*n2)`` and ``ks_at`` is the
    smallest value attaining the maximal ECDF gap (deterministic
    tiebreak)."""
    g = _value_counts(df, value_col, group_col, a, b)
    c = global_prefix_sum(
        g, ["__v"], ["c1", "c2"], ["cum1", "cum2"]
    ).select("__v", "cum1", "cum2")
    t = g.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    d = c.crossJoin(F.broadcast(t)).select(
        "__v",
        F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias(
            "diff"
        ),
        "n1",
        "n2",
    )
    m = d.agg(F.max("diff").alias("d_scaled"))
    return (
        d.join(F.broadcast(m), d["diff"] == m["d_scaled"])
        .groupBy("n1", "n2", "d_scaled")
        .agg(F.min("__v").alias("ks_at"))
        .select(
            "n1",
            "n2",
            "d_scaled",
            (
                F.col("d_scaled").cast("double")
                / (F.col("n1") * F.col("n2")).cast("double")
            ).alias("d_stat"),
            "ks_at",
        )
    )


def mannwhitney_u(
    df: DataFrame, value_col: str, group_col: str, a: str, b: str
) -> DataFrame:
    """Mann-Whitney U with average-rank ties: one row ``(n1, n2,
    u1_x2, u2_x2, auc)``. Ranks are DOUBLED so tie-averages stay
    integral: a tie group of size t ending at cumulative position cumt
    holds ranks averaging (2*cumt - t + 1)/2, hence
    ``2*R1 = SUM(c1 * (2*cumt - t + 1))`` is exact int64;
    ``u1_x2 = 2*R1 - n1*(n1+1)`` and ``auc = u1_x2 / (2*n1*n2)`` is
    the common-language effect size P[a > b]."""
    g = _value_counts(df, value_col, group_col, a, b).withColumn(
        "t", F.col("c1") + F.col("c2")
    )
    c = global_prefix_sum(g, ["__v"], "t", "cumt").select(
        "c1", "c2", "t", "cumt"
    )
    s = c.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.col("c1") * (2 * F.col("cumt") - F.col("t") + 1)).alias("r1_x2"),
    )
    u1 = F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        "n1",
        "n2",
        u1.alias("u1_x2"),
        (2 * F.col("n1") * F.col("n2") - u1).alias("u2_x2"),
        (u1.cast("double") / (2 * F.col("n1") * F.col("n2")).cast("double")).alias(
            "auc"
        ),
    )

"""Key-distribution profiling: the diagnostic a 100 TB join runs
BEFORE it shuffles.

Every skew mitigation in this repo (`operators/skew.salted_join`, AQE
skew-join, broadcast promotion) starts from the same question: *how
hot is the hottest key?* The profiler answers it with one partial-agg
pass — per-key counts combine map-side, the global totals ride along
as a broadcast one-row aggregate, and only the top-k rows (a constant)
ever reach the driver. Profiling 100 TB costs one scan + one
shuffle-by-key whose reduce side is count-sized, not row-sized.

The output feeds a concrete decision rule, documented with the skew
module: ``skew_ratio`` ≳ 5-10 on a join key → salt or split that key;
``share`` of a single key ≳ 1/shuffle-partitions → that task is the
straggler ceiling no matter how many executors exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_skew_profile(df: DataFrame, key_col: str, top_k: int = 20) -> DataFrame:
    """Top-``top_k`` hottest values of ``key_col`` with absolute count,
    corpus share, and skew ratio vs the mean key frequency.

    Columns: key (string), cnt, share (round 6), skew_ratio (round 4).
    Deterministic under ties (cnt DESC, key ASC). NULL keys count as a
    key of their own (rendered as the string 'NULL') — a NULL-heavy
    join column is the most common real-world skew case, and a
    profiler that silently drops it hides exactly the problem it
    exists to find.
    """
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("NULL"))
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # one-row global aggregate; broadcast-joined back so share/ratio
    # stay executor-side (no driver collect in the operator)
    totals = counts.agg(
        F.sum("cnt").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
            # widen to double BEFORE multiplying: at the 100 TB target
            # (cnt ~1e12, n_keys ~1e9) the long product silently wraps
            # 2^63 in non-ANSI Spark and diverges from DuckDB's HUGEINT
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total_rows"),
                4,
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_k)
    )


def column_profile(
    df: DataFrame, cols: list[str], exact_distinct: bool = True
) -> DataFrame:
    """Per-column data profile in ONE scan: null count, distinct
    count, numeric min/max (rounded 4) — long format, one output row
    per profiled column.

    All per-column aggregates live in a single ``agg`` so the input is
    read once; multiple exact ``count_distinct`` columns plan as one
    Expand (row stream duplicated per distinct column) feeding one
    partial+final aggregate — a deliberate rows×k trade for a single
    pass. At 100 TB that Expand is the cost to watch: set
    ``exact_distinct=False`` and the profile switches to
    ``approx_count_distinct`` (HyperLogLog++, mergeable, no Expand),
    which is what a production profiler runs on full-corpus sweeps;
    the exact form is the oracle-checkable contract.
    """
    aggs: list[F.Column] = []
    for c in cols:
        col = F.col(c)
        nd = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.when(col.isNull(), F.lit(1))).alias(f"{c}__nulls"),
            nd.alias(f"{c}__distinct"),
            F.round(F.min(col.cast("double")), 4).alias(f"{c}__min"),
            F.round(F.max(col.cast("double")), 4).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(rows))


def distribution_psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline: str,
    bin_width: int = 50,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index of ``value_col``'s distribution for
    every ``group_col`` slice vs the ``baseline`` slice — the standard
    ingestion drift monitor (PSI < 0.1 stable, 0.1-0.25 drifting,
    > 0.25 shifted; banking scorecard convention, applied to corpus
    intake).

    PSI = Σ_bins (p - q) · ln(p / q) over fixed-width value bins,
    with the ε-floor convention on empty bins so the sum is defined
    when one side misses a bin. Everything is one partial+final
    aggregate over (slice, bin) — at 100 TB the shuffle carries one
    row per (slice, bin), the output one row per slice. Run per
    ingest batch against a persisted baseline histogram; alert on the
    0.25 line before a drifted source poisons the mixture.
    """
    binned = df.select(
        F.col(group_col).alias("grp"),
        F.floor(F.col(value_col) / bin_width).alias("bin"),
    )
    counts = binned.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("grp").agg(F.sum("n").alias("tot"))
    frac = counts.join(totals, "grp").select(
        "grp", "bin", (F.col("n").cast("double") / F.col("tot")).alias("p")
    )
    base = frac.filter(F.col("grp") == baseline).select(
        "bin", F.col("p").alias("q")
    )
    rest = frac.filter(F.col("grp") != baseline)
    # explicit (slice × bin) grid over the global bin union: a bin
    # held by only one side still contributes via the ε floor, and a
    # bin empty on BOTH sides contributes exactly 0 — so the grid can
    # safely be the union (tiny: |slices| × |bins| rows, broadcast)
    grid = rest.select("grp").distinct().crossJoin(
        binned.select("bin").distinct()
    )
    joined = grid.join(rest, ["grp", "bin"], "left").join(base, "bin", "left")
    p = F.coalesce(F.col("p"), F.lit(0.0)) + eps
    q = F.coalesce(F.col("q"), F.lit(0.0)) + eps
    return (
        joined.groupBy("grp")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi"))
        .select(F.col("grp").alias(group_col), "psi")
    )


def value_histogram(
    df: DataFrame, value_col: str, bin_width: int = 50
) -> DataFrame:
    """(bin, n) fixed-width histogram of ``value_col`` — the persisted
    baseline artifact the drift monitors compare against (tiny: one
    row per occupied bin, whatever the corpus size). NULL values are
    unmeasurable, not a bin: they are dropped here (a NULL bin's key
    would never equi-join a baseline bin, turning PSI into an
    arbitrary large number instead of a deliberate verdict — the
    drift gate quarantines unmeasurable batches explicitly instead)."""
    return (
        df.select(F.floor(F.col(value_col) / bin_width).alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def psi_between(
    cur_hist: DataFrame, base_hist: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """One-row (psi) between two (bin, n) histograms — the pairwise
    core of :func:`distribution_psi`, for the streaming case where the
    baseline is a PERSISTED histogram and the current side is a
    micro-batch. Same ε-floor convention; bins empty on both sides
    contribute 0, so the join can be a plain full outer on bin.
    Histogram-sized work only."""
    c = cur_hist.groupBy().agg(F.sum("n").alias("ct")).crossJoin(
        cur_hist
    ).select("bin", (F.col("n").cast("double") / F.col("ct")).alias("p"))
    b = base_hist.groupBy().agg(F.sum("n").alias("bt")).crossJoin(
        base_hist
    ).select("bin", (F.col("n").cast("double") / F.col("bt")).alias("q"))
    p = F.coalesce(F.col("p"), F.lit(0.0)) + eps
    q = F.coalesce(F.col("q"), F.lit(0.0)) + eps
    return (
        c.join(b, "bin", "full")
        .agg(F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi"))
    )

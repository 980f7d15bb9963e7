"""Time-series operators over the events table: regular-grid gap fill
with forward fill.

Resampling an irregular event stream onto a regular grid (and carrying
the last observation forward across empty buckets) is the standard
feature-engineering step before windowed training data extraction.
SQL engines make it awkward; here it is three small DataFrame stages:

1. bucket aggregation (one shuffle on (key, bucket)),
2. a per-key date spine via ``sequence()`` + ``explode`` — generated
   executor-side from each key's [min, max] bounds, so the spine never
   exists on the driver and its size is bounded by key-activity span,
3. a left join of spine to observations plus one ``last(ignorenulls)``
   window for the forward fill — both riding the same (key) shuffle.

At 100 TB the spine explode is the part to watch: a key active for a
year adds 365 rows — output-proportional, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """(key, d, sv, filled, is_gap): daily sums on each key's own
    [first-active-day, last-active-day] grid; missing days carry the
    last observed daily sum forward.

    ``sv`` is NULL on gap days (the raw observation), ``filled`` is the
    forward-filled series, ``is_gap`` flags synthesized rows. Daily
    sums are rounded to 2 before filling so copies stay bit-identical.
    """
    d = F.to_date(F.date_trunc("day", F.col(ts_col)))
    daily = (
        events.groupBy(F.col(key_col).alias("k"), d.alias("d"))
        .agg(F.round(F.sum(val_col), 2).alias("sv"))
    )
    spine = (
        daily.groupBy("k")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select("k", F.explode(F.sequence("d0", "d1")).alias("d"))
    )
    joined = spine.join(daily, ["k", "d"], "left")
    w = (
        Window.partitionBy("k")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        F.col("k").alias(key_col),
        "d",
        "sv",
        F.last("sv", ignorenulls=True).over(w).alias("filled"),
        F.col("sv").isNull().alias("is_gap"),
    )


def rolling_distinct(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "event_type",
    days: int = 7,
) -> DataFrame:
    """Per-row trailing-``days`` distinct count of ``val_col`` within
    each key: engagement breadth ("distinct event types this user
    touched in the last week"), the windowed-cardinality feature
    behind churn/quality models.

    Spark's range window has no COUNT(DISTINCT), so the distinct set
    is materialized per frame with ``collect_set().over(range)`` and
    sized — correct, and bounded by the per-frame cardinality of
    ``val_col`` (small for categorical features; do NOT point this at
    a high-cardinality value column, that is what sketch columns are
    for). The frame is anchored on exact integer microseconds
    (``unix_micros``), not a seconds cast — second-truncation would
    shift frame edges for sub-second timestamps and diverge from
    timestamp-interval arithmetic. One shuffle on (key); the sort
    inside each key is the window's own.
    """
    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(key_col)
        .orderBy(us)
        .rangeBetween(-days * 86_400 * 1_000_000, 0)
    )
    return events.select(
        key_col,
        ts_col,
        val_col,
        F.size(F.collect_set(val_col).over(w)).alias(f"n_distinct_{days}d"),
    )

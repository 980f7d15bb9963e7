"""Mergeable-sketch aggregates: the 100 TB substitutes for exact
distinct counts and percentiles.

Exact `count_distinct` shuffles every distinct value; exact
`percentile` sorts each group. Both stop being reasonable when a group
holds billions of rows. The sketch forms (HyperLogLog++ for distinct,
t-digest for quantiles) are *mergeable*: partial sketches combine
map-side like any other partial aggregate, so the shuffle carries a
few KB per group regardless of group size — and the same property is
what makes them usable as incremental rollups (yesterday's sketch +
today's sketch = month-to-date) and in streaming state.

These wrappers pin the engine's accuracy contract (rsd / error knobs)
in one place; tests/test_sketches.py verifies the contract against the
exact computations at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ~2.3% default relative standard deviation for HLL++; tests assert a
# conservative 3x bound.
DISTINCT_RSD = 0.023
# t-digest accuracy knob: higher = tighter quantiles, bigger sketch.
PERCENTILE_ACCURACY = 10_000


def approx_distinct_by(
    df: DataFrame, group_col: str, value_col: str, rsd: float = DISTINCT_RSD
) -> DataFrame:
    """(group, n_distinct_approx): HLL++ distinct count per group."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("n_distinct_approx")
    )


def approx_percentiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = PERCENTILE_ACCURACY,
) -> DataFrame:
    """(group, p_<q>...): t-digest percentile profile per group."""
    return df.groupBy(group_col).agg(
        *[
            F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)).alias(
                f"p_{str(p).replace('0.', '')}"
            )
            for p in probs
        ]
    )

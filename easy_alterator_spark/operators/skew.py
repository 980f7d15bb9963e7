"""Skew-resilient join: explicit key salting.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) already splits
oversized partitions at runtime and is the FIRST tool to reach for —
this module is for the cases AQE cannot fix:

- skewed keys on the *build/broadcast-ineligible* side of a
  shuffled-hash or sort-merge join where one key exceeds a single
  task's memory even after AQE splitting (AQE splits map outputs, but
  all rows of one key on the probe side still meet the SAME build
  rows);
- streaming joins (no AQE);
- deterministic plan shape requirements (bench reproducibility).

Mechanism: replicate the small side `salt` times (row r -> (r, 0..salt-1))
and scatter the big side uniformly with a per-row salt derived from a
stable hash of the whole row — the join key becomes (key, salt), so one
hot key spreads over `salt` shuffle partitions. Replication multiplies
the small side by `salt`: keep salt modest (8-32) and the small side
genuinely small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join `big` with `small` on column `on`, salting the key into
    `salt` sub-keys so hot keys in `big` spread across tasks.

    The big side's salt must be deterministic (re-computable on task
    retry — `rand()` would break exactly-once semantics under
    recomputation): xxhash64 over all columns pmod salt.
    """
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = big_salted.join(small_salted, [on, "__salt"], how)
    return out.drop("__salt")

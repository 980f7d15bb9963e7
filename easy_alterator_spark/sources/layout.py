"""Data-layout keys: Z-order (Morton) interleaving for multi-column
clustering.

Why it matters at 100 TB: a range sort on ONE column gives min/max
file pruning on that column only; queries filtering another column
scan everything. Writing files ordered by the Z-value of k columns
gives each file a small hyper-rectangle of the key space, so scans
filtering ANY of the k columns prune most files (the same idea behind
Delta OPTIMIZE ZORDER BY / Iceberg sort orders).

The key is pure Column bit-math — row-local, no shuffle of its own;
pair it with ``repartitionByRange(z).sortWithinPartitions(z)`` (e.g.
via sources/compact.py) to materialize the layout.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def z_order_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton-interleave the low `bits` of two non-negative ints:
    bit i of x lands at position 2i, bit i of y at 2i+1.

    Callers normalize inputs to [0, 2^bits) first — rank, bucket, or
    modulo, depending on the column's distribution (a plain modulo is
    fine for already-uniform keys; use width buckets for skewed ones).
    2*bits must stay <= 62 so the result fits a long.
    """
    if bits < 1 or bits > 26:
        # 2^(2*bits+1) must stay exactly representable through the
        # double-typed pow below AND fit a long: bits <= 26 keeps the
        # largest multiplier at 2^53
        raise ValueError(f"bits must be in [1, 26], got {bits}")
    idx = F.sequence(F.lit(0), F.lit(bits - 1))
    # sum over i: bit_i(x) * 2^(2i) + bit_i(y) * 2^(2i+1). The shift
    # amount is a lambda variable, so shiftleft (literal-only in the
    # Python API) is out — multiply by an exact power of two instead
    # (pow(2, k) is exact in a double for k <= 53). Contributions
    # occupy disjoint bit positions, so + == |.
    def bit(col: Column, i: Column) -> Column:
        return F.floor(col.cast("long") / F.pow(F.lit(2.0), i.cast("double"))).cast(
            "long"
        ).bitwiseAND(F.lit(1))

    return F.aggregate(
        idx,
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + bit(x, i) * F.pow(F.lit(2.0), (i * 2).cast("double")).cast("long")
        + bit(y, i) * F.pow(F.lit(2.0), (i * 2 + 1).cast("double")).cast("long"),
    )

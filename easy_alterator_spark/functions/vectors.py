"""Vector math as pure Column expressions (JVM-side, codegen-friendly).

All of these run inside whole-stage codegen — no Python UDFs. Element
types are cast to double *before* accumulation so results are
bit-identical to a DuckDB oracle accumulating left-to-right in float64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    """array<float> -> array<double> (deterministic accumulation base)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_d(a: Column, b: Column) -> Column:
    """Dot product of two columns ALREADY in array<double> (outputs of
    :func:`unit` / :func:`as_double`) — skips the per-side re-cast
    transform, so a pair join's hot loop is ONE zip_with+aggregate
    pass instead of three array passes."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe for zero vectors (returns NULL)."""
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def unit(a: Column) -> Column:
    """Unit-normalize (NULL for zero vectors).

    Pairwise scoring should normalize each side ONCE before the join —
    cosine(a, b) inside an n² pair join recomputes both norms per pair
    (3 aggregate passes); dot(unit(a), unit(b)) with the normalization
    pushed below the join is one pass per pair and O(n) norm work.
    """
    n = norm(a)
    return F.when(n != 0, F.transform(as_double(a), lambda x: x / n))

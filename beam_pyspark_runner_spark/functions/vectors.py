"""Vector math over ``array<float|double>`` columns, JVM-side.

Built entirely from higher-order functions (``aggregate``/``zip_with``)
so similarity scans stay inside Catalyst/codegen — no Python crossing.
``F.aggregate`` folds left-to-right, so double accumulation order is
deterministic per row (index order), matching DuckDB's list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dbl(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns (double accumulation, index order)."""
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; deterministic given identical inputs."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance (double accumulation, index order).

    The PQ/k-means distance kernel; squared form avoids the sqrt (argmin
    is order-preserving) and keeps the fold bit-reproducible against
    DuckDB's ``list_reduce`` twin.
    """
    return F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

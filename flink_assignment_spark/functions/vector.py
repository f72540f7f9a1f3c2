"""Vector (embedding) column functions.

All pure Catalyst higher-order functions over ``array<float>`` —
no UDFs, so similarity math runs inside whole-stage codegen.

Arithmetic note: ``dot`` folds left-to-right over the array in
double precision; the DuckDB oracles use an expression with the same
association order, so results are bit-identical, not just close.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] in double precision, left-to-right fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

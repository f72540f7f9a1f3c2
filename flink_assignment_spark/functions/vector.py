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
    """Σ a[i]·b[i] in double precision, left-to-right fold.

    Works for any dimension, but the lambda fold is interpreted
    per-element — use :func:`dot_fixed` on hot paths when the
    dimension is known.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """Σ a[i]·b[i] as an explicit ``dim``-term expression tree.

    Left-associated like :func:`dot` (bit-identical result), but a
    flat Catalyst expression that whole-stage codegen compiles to
    straight-line Java — ~100× faster than the interpreted HOF fold
    on pairwise similarity workloads.
    """
    acc = None
    for i in range(1, dim + 1):
        term = F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        acc = term if acc is None else acc + term
    return acc


def make_pair_dot_udf():
    """See functions/_pandas_udfs.py (module without stringized
    annotations, which PySpark's type inference requires)."""
    from ._pandas_udfs import make_pair_dot_udf as _m

    return _m()


def norm(a: Column, dim: int | None = None) -> Column:
    d = dot_fixed(a, a, dim) if dim else dot(a, a)
    return F.sqrt(d)


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim:
        return dot_fixed(a, b, dim) / (norm(a, dim) * norm(b, dim))
    return dot(a, b) / (norm(a) * norm(b))

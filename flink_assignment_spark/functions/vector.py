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


def _dot_fixed_sql(a: str, b: str, dim: int) -> str:
    """The :func:`dot_fixed` term chain as a SQL string over two NAMED
    array columns — left-associated, term-identical to the Column
    form (same casts, same op order, bit-identical doubles)."""
    return " + ".join(
        f"(CAST(element_at({a}, {i}) AS DOUBLE) * CAST(element_at({b}, {i}) AS DOUBLE))"
        for i in range(1, dim + 1)
    )


def cosine_fixed(a: str, b: str, dim: int) -> Column:
    """:func:`cosine` with a known dimension over two NAMED columns,
    built as ONE parsed ``F.expr`` — the random_project lesson applied
    to the cosine path: composing the 3 x dim-term tree column by
    column costs ~11k py4j round-trips, which MEASURED as ~2.5 s of
    driver time per plan build (q43 spent more time building its
    DataFrame than executing it). The parsed tree is node-identical
    to ``dot_fixed(a,b)/(sqrt(dot_fixed(a,a))*sqrt(dot_fixed(b,b)))``,
    so results are bit-identical."""
    return F.expr(
        f"({_dot_fixed_sql(a, b, dim)})"
        f" / (SQRT({_dot_fixed_sql(a, a, dim)}) * SQRT({_dot_fixed_sql(b, b, dim)}))"
    )


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


def random_projection_signs(in_dim: int, out_dim: int, salt: str = "rp") -> list[list[int]]:
    """Deterministic ±1 Rademacher projection matrix (Achlioptas 2003:
    ±1 entries satisfy the Johnson-Lindenstrauss lemma like Gaussians
    do). Signs derive from md5 of "salt:j:i" — computed driver-side
    with hashlib and embedded as literals in BOTH the Spark expression
    and the DuckDB oracle, so the projection is reproducible anywhere.
    Returns ``signs[j][i]`` for output dim j, input dim i."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()[:15], 16) % 2 == 0 else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_project(vec_col: str, in_dim: int, out_dim: int, salt: str = "rp") -> Column:
    """Project ``array<float>`` down to ``out_dim`` dims with the
    deterministic ±1 matrix, scaled 1/√out_dim (JL normalization).
    Each output dim is a flat left-associated ``in_dim``-term Catalyst
    chain — whole-stage codegen compiles it to straight-line Java; no
    UDF, no shuffle. The oracle mirrors the association order term by
    term. Built as ONE ``F.expr`` string: composing the ~512 terms as
    Python Column arithmetic costs a Py4J round-trip per operator
    (~6 s of driver time for 8×64); the parsed-string form is free."""
    import math

    signs = random_projection_signs(in_dim, out_dim, salt)
    scale = 1.0 / math.sqrt(out_dim)
    dims = []
    for j in range(out_dim):
        chain = " + ".join(
            f"{'' if signs[j][i] == 1 else '-'}CAST({vec_col}[{i}] AS DOUBLE)"
            for i in range(in_dim)
        )
        dims.append(f"round(({chain}) * {scale!r}, 6)")
    return F.expr(f"array({', '.join(dims)})")


def vec_repr(arr: Column) -> Column:
    """Canonical driver-safe scalar encoding of a numeric vector:
    each element scaled to integer micro-units (round(x·1e6) as
    BIGINT) and comma-joined into one string.

    Why this exists: the driver's correctness compare canonicalizes
    result frames with pandas ``sort_values``, which cannot sort
    ``array<double>`` columns (``unhashable type: 'list'``) — so any
    registry query that returns a first-class vector must emit this
    string form instead. Integer micro-units sidestep every
    cross-engine float-rendering hazard (Spark's ``1.0E-7``
    scientific casts, DuckDB's shortest-round-trip printing, printf
    tie-rounding): both engines round half-away-from-zero on the
    exact binary value, then print a BIGINT, which is byte-identical
    everywhere. Pair with :func:`vec_repr_sql` in the DuckDB oracle.
    """
    return F.array_join(
        F.transform(
            arr,
            lambda v: F.round(v.cast("double") * 1000000, 0)
            .cast("bigint")
            .cast("string"),
        ),
        ",",
    )


def vec_repr_sql(expr: str) -> str:
    """DuckDB twin of :func:`vec_repr` for oracle SQL strings:
    ``vec_repr_sql("list(x ORDER BY pos)")`` → the same
    comma-joined micro-unit encoding. DuckDB ``round(double)`` is
    half-away-from-zero on the exact binary value, matching Spark's
    ``round(x, 0)`` HALF_UP — ties land identically."""
    return (
        "array_to_string(list_transform("
        + expr
        + ", x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)"
        " AS VARCHAR)), ',')"
    )

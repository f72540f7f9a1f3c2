"""Skew mitigation: salted aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one repo with half the commits, one
user with half the events) serialize a shuffle stage. Two standard
remedies, both pure Catalyst:

- :func:`salted_agg` — two-level aggregation with a random salt:
  groupBy(key, salt) partial-aggregates the hot key into N cells,
  then groupBy(key) merges the cells. Correct for any algebraic
  aggregate expressed as (partial, merge) pairs; exposed here for
  count/sum (min/max compose the same way).
- AQE's ``skewJoin`` (enabled in session.py) auto-splits skewed
  sort-merge partitions at runtime — preferred when it applies; the
  explicit salt remains for aggregations, which AQE does not split.

The salt uses ``rand`` seeded deterministically so runs are
reproducible; the FINAL result is salt-invariant either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) LEFT side with a
    deterministic random cell and replicate the RIGHT side across the
    full salt domain, joining on (key..., salt). A key holding half
    the left rows then spreads over ``n_salts`` reducer partitions
    instead of serializing one; the right side pays an ``n_salts``×
    replication, so keep it the smaller input. Result rows are
    identical to the plain join (each left row meets each matching
    right row in exactly one salt cell).

    Prefer AQE's runtime skew-join split when it fires; this explicit
    form covers plans AQE does not rewrite (e.g. when the skewed side
    is already partitioned by an upstream stage).

    Only left-oriented joins are supported: under right/full outer an
    unmatched right row would surface once per salt cell (n_salts
    null-padded duplicates), so those are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would duplicate "
            "unmatched right-side rows across salt cells"
        )
    # pick a working column absent from BOTH inputs — a caller column
    # literally named "__salt" would otherwise be silently overwritten
    # on the left and collide with the join key on the right
    salt_col = "__salt"
    taken = set(left.columns) | set(right.columns)
    while salt_col in taken:
        salt_col = "_" + salt_col
    l = left.withColumn(salt_col, (F.rand(seed) * n_salts).cast("int"))
    r = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on + [salt_col], how).drop(salt_col)


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """count(*) + sum(c) per key via salt → merge two-phase plan.

    Returns key_cols + ``cnt`` + ``sum_<c>`` for each c in sum_cols.
    Equivalent to ``df.groupBy(key).agg(count, sums)`` but the first
    shuffle spreads each key over ``n_salts`` reducer cells, so one
    hot key cannot serialize a reducer.
    """
    salt_col = "__salt"
    while salt_col in df.columns:  # avoid clobbering a caller column
        salt_col = "_" + salt_col
    salt = (F.rand(seed) * n_salts).cast("int").alias(salt_col)
    partial = (
        df.select(*key_cols, salt, *sum_cols)
        .groupBy(*key_cols, salt_col)
        .agg(
            F.count("*").alias("__cnt"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
        )
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.sum("__cnt").alias("cnt"),
            *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
    )

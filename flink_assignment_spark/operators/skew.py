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
    salt = (F.rand(seed) * n_salts).cast("int").alias("__salt")
    partial = (
        df.select(*key_cols, salt, *sum_cols)
        .groupBy(*key_cols, "__salt")
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

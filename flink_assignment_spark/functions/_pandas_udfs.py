"""Arrow-batched Pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations`` —
PySpark infers the UDF eval type from real (non-stringized) type
hints.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_pair_dot_udf():
    """Σ a[i]·b[i] per row in double precision with SEQUENTIAL
    summation (``cumsum`` is a left-to-right scan) — bit-identical to
    a left-associated Catalyst/SQL sum, but vectorized numpy over
    Arrow batches. Used on pairwise-similarity hot paths where the
    64-term generated expression would overflow JIT method limits."""

    @pandas_udf("double")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.values).astype(np.float64)
        B = np.stack(b.values).astype(np.float64)
        return pd.Series((A * B).cumsum(axis=1)[:, -1])

    return pair_dot


def make_lsh_buckets_udf(weights):
    """Bucket ids for all LSH tables at once: V @ W.T sign bits packed
    per table. ``weights`` is a prebuilt (n_tables, n_planes, dim)
    float64 ndarray of deterministic hyperplane weights; the matmul
    replaces an n_tables*n_planes*dim-term Catalyst expression whose
    plan compilation alone dominates runtime."""
    n_tables, n_planes, dim = weights.shape
    W = weights.reshape(n_tables * n_planes, dim)

    @pandas_udf("array<int>")
    def buckets(v: pd.Series) -> pd.Series:
        V = np.stack(v.values).astype(np.float64)
        S = (V @ W.T) > 0  # (rows, tables*planes)
        S = S.reshape(len(V), n_tables, n_planes)
        packed = (S.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=2)
        return pd.Series(list(packed.astype(np.int32)))

    return buckets

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


def make_block_pair_scorer(corpus_ids, corpus_matrix, mode):
    """mapInPandas kernel for blocked all-pairs cosine scoring.

    The corpus (ids + float64 matrix) is captured in the closure —
    Spark ships it once per executor (broadcast-variable pattern), so
    pairwise scoring is a per-batch numpy computation with NO pairwise
    shuffle or nested-loop join.

    Exactness: products are summed with ``cumsum`` along the dim axis
    (left-to-right) and norms use the same fold, so the UNROUNDED
    cosine is bit-identical to the SQL oracle's left-associated
    expression; rounding/thresholding stays engine-side. ``mode``:
      'upper' → emit pairs with row_id < corpus_id (near-dup dedup)
      'all'   → emit all non-self pairs (feeds top-k ranking)
    """
    C = corpus_matrix.astype(np.float64)
    c_norms = np.sqrt((C * C).cumsum(axis=1)[:, -1])

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows_id = pdf.iloc[:, 0].values.astype(np.int64)
            R = np.stack(pdf.iloc[:, 1].values).astype(np.float64)
            r_norms = np.sqrt((R * R).cumsum(axis=1)[:, -1])
            # left-associative dot product accumulated one dim at a
            # time: the identical fold order to cumsum(...)[..., -1]
            # (and the oracle's left-assoc sum) WITHOUT materializing
            # the (batch, corpus, dim) 3-D intermediate — the 2-D
            # accumulator stays cache-resident, ~10x faster
            acc = R[:, 0, None] * C[None, :, 0]
            for d in range(1, C.shape[1]):
                acc += R[:, d, None] * C[None, :, d]
            cos = acc / (r_norms[:, None] * c_norms[None, :])
            if mode == "upper":
                mask = rows_id[:, None] < corpus_ids[None, :]
            else:
                mask = corpus_ids[None, :] != rows_id[:, None]
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": rows_id[ii], "id_b": corpus_ids[jj], "cos_sim": cos[ii, jj]}
            )

    return score


def make_cell_assign_udf(centroids, n_nearest):
    """array<int> of the ``n_nearest`` centroid ids by L2 distance —
    one numpy pass per Arrow batch (IVF cell assignment / probing)."""
    C = centroids.astype(np.float64)

    @pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        V = np.stack(v.values).astype(np.float64)
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_nearest]
        return pd.Series(list(order.astype(np.int32)))

    return assign

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

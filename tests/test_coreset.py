"""Greedy k-center selection: equals the numpy reference traversal,
radii are non-increasing, selection is deterministic, and degenerate
inputs behave."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from flink_assignment_spark.operators.coreset import kcenter_select
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR


def _numpy_greedy(ids, mat, k):
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    chosen = [0]  # min id seeds
    d2 = np.full(len(ids), np.inf)
    out = [(int(ids[0]), 1, None)]
    for rank in range(2, k + 1):
        c = mat[chosen[-1]]
        # left-associated fold (cumsum) — bit-identical to the
        # engine's flat expression tree, the repo's in-order-fold rule
        d2 = np.minimum(d2, np.cumsum((mat - c[None, :]) ** 2, axis=1)[:, -1])
        d2[chosen] = -1.0
        best = int(np.lexsort((ids, -d2))[0])
        if d2[best] <= 0:
            break
        out.append((int(ids[best]), rank, round(float(d2[best]) ** 0.5, 6)))
        chosen.append(best)
    return out


def test_kcenter_matches_numpy_reference(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    want = _numpy_greedy(ids, mat, 12)
    got = [
        (r.center_id, r.sel_rank, r.radius)
        for r in kcenter_select(emb, 12).orderBy("sel_rank").collect()
    ]
    assert got == want


def test_kcenter_radii_nonincreasing_and_deterministic(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = kcenter_select(emb, 8).orderBy("sel_rank").collect()
    b = kcenter_select(emb, 8).orderBy("sel_rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    radii = [r.radius for r in a if r.radius is not None]
    assert all(x >= y for x, y in zip(radii, radii[1:]))
    assert len({r.center_id for r in a}) == len(a)


def test_kcenter_exhausts_duplicate_corpus(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0]) for i in range(5)]
        + [Row(vec_id=9, embedding=[5.0, 5.0])]
    )
    got = kcenter_select(df, 6).orderBy("sel_rank").collect()
    # one point per distinct location: radius hits 0 after the two
    # distinct positions are covered
    assert [r.center_id for r in got] == [0, 9]


def test_kcenter_validates_inputs(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    with pytest.raises(ValueError, match="k must be"):
        kcenter_select(emb, 0)
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(emb.filter("vec_id < 0"), 3)

"""Streaming k-center (Charikar doubling) vs batch q133: a one-batch
stream equals kcenter_select exactly; multi-batch maintenance keeps at
most k centers, its recorded coverage bound really covers every point
ever streamed, replays are no-ops, and uncheckpointed restarts are
refused."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from flink_assignment_spark.operators.coreset import kcenter_select
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.coreset_stream import (
    coreset_meta,
    merge_coreset_batch,
    read_coreset,
)

from .conftest import SF_DIR

K = 8
SCHEMA = "vec_id long, embedding array<float>"


def _rows(spark):
    return [
        (r.vec_id, list(r.embedding))
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    ]


def _replay(spark, state_dir, rows, n_batches):
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_coreset_batch(
                spark.createDataFrame(chunk, SCHEMA), b, str(state_dir), K
            )


def _max_dist_to_centers(spark, state_dir, rows):
    state_ids = {
        r.center_id for r in read_coreset(spark, str(state_dir)).collect()
    }
    vecs = {cid: np.asarray(v, dtype=np.float64) for cid, v in rows}
    centers = [vecs[c] for c in state_ids]
    return max(
        min(float(((c - v) ** 2).sum()) ** 0.5 for c in centers)
        for v in vecs.values()
    )


def test_single_batch_stream_equals_batch_q133(spark, tmp_path):
    state = tmp_path / "kc"
    rows = _rows(spark)
    merge_coreset_batch(spark.createDataFrame(rows, SCHEMA), 0, str(state), K)
    emb = load_table(spark, SF_DIR, "embeddings")
    want = {
        (r.center_id, r.sel_rank, r.radius)
        for r in kcenter_select(emb, K).collect()
    }
    got = {
        (r.center_id, r.sel_rank, r.radius)
        for r in read_coreset(spark, str(state)).collect()
    }
    assert got == want


def test_multibatch_bounded_centers_and_true_coverage(spark, tmp_path):
    """The doubling invariants, re-measured instead of cited: never
    more than k centers, and the recorded ``cover`` bound really
    covers the max distance from ANY streamed point to the final
    center set."""
    state = tmp_path / "kc"
    rows = _rows(spark)
    _replay(spark, state, rows, n_batches=4)
    meta = coreset_meta(str(state))
    assert meta["n_centers"] <= K
    true_max = _max_dist_to_centers(spark, state, rows)
    assert true_max <= meta["cover"] + 1e-9, (true_max, meta)


def test_coreset_radius_and_cover_monotone(spark, tmp_path):
    state = tmp_path / "kc"
    rows = _rows(spark)
    per = (len(rows) + 3) // 4
    prev_r, prev_cover = -1.0, -1.0
    for b in range(4):
        chunk = rows[b * per : (b + 1) * per]
        if not chunk:
            continue
        merge_coreset_batch(spark.createDataFrame(chunk, SCHEMA), b, str(state), K)
        meta = coreset_meta(str(state))
        assert meta["r"] >= prev_r and meta["cover"] >= prev_cover
        prev_r, prev_cover = meta["r"], meta["cover"]


def test_coreset_deterministic_replay(spark, tmp_path):
    rows = _rows(spark)
    a, b = tmp_path / "a", tmp_path / "b"
    _replay(spark, a, rows, n_batches=3)
    _replay(spark, b, rows, n_batches=3)
    ra = sorted(map(tuple, read_coreset(spark, str(a)).collect()))
    rb = sorted(map(tuple, read_coreset(spark, str(b)).collect()))
    assert ra == rb
    assert coreset_meta(str(a)) == coreset_meta(str(b))


def test_coreset_marker_skips_redelivery(spark, tmp_path):
    state = tmp_path / "kc"
    rows = _rows(spark)
    _replay(spark, state, rows, n_batches=3)
    before = sorted(map(tuple, read_coreset(spark, str(state)).collect()))
    meta_before = coreset_meta(str(state))
    # full redelivery of an applied batch id: marker no-op
    merge_coreset_batch(
        spark.createDataFrame(rows[:10], SCHEMA), 1, str(state), K
    )
    assert sorted(map(tuple, read_coreset(spark, str(state)).collect())) == before
    assert coreset_meta(str(state)) == meta_before


def test_coreset_small_seed_batch_grows_later(spark, tmp_path):
    """A seed batch smaller than k leaves open slots; later batches
    fill them Gonzalez-style before any doubling."""
    state = tmp_path / "kc"
    rows = _rows(spark)
    merge_coreset_batch(spark.createDataFrame(rows[:3], SCHEMA), 0, str(state), K)
    n0 = coreset_meta(str(state))["n_centers"]
    assert n0 <= 3
    merge_coreset_batch(spark.createDataFrame(rows[3:60], SCHEMA), 1, str(state), K)
    meta = coreset_meta(str(state))
    assert n0 <= meta["n_centers"] <= K


def test_coreset_uncheckpointed_restart_refused(spark, tmp_path):
    import pytest

    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.coreset_stream import (
        incremental_coreset,
    )

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 2)
    dummy = spark.createDataFrame([(1, [0.0, 1.0])], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_coreset(dummy, state_dir, K)

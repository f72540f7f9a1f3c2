"""Streaming drift monitor == batch q134 after an in-order replay;
double-counting is impossible (atomic fold+marker); the trajectory
records one snapshot per batch."""

from __future__ import annotations

from flink_assignment_spark.queries.synthetic import DRIFT_CUTOFF, REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.drift_stream import (
    drift_trajectory,
    merge_drift_batch,
    read_drift,
)

from .conftest import SF_DIR

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _replay(spark, state_dir, n_batches=4):
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id").collect()
    per = (len(ev) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = ev[b * per : (b + 1) * per]
        if chunk:
            merge_drift_batch(
                spark.createDataFrame(chunk, SCHEMA), b, str(state_dir), DRIFT_CUTOFF
            )


def test_drift_stream_matches_batch_q134(spark, tmp_path):
    state = tmp_path / "drift"
    _replay(spark, state)
    want = {
        tuple(r)
        for r in REGISTRY["q134_distribution_drift"].spark(spark, SF_DIR).collect()
    }
    got = {tuple(r) for r in read_drift(spark, str(state)).collect()}
    assert got == want


def test_drift_redelivery_cannot_double_count(spark, tmp_path):
    state = tmp_path / "drift"
    _replay(spark, state, n_batches=3)
    before = {tuple(r) for r in read_drift(spark, str(state)).collect()}
    ev = load_table(spark, SF_DIR, "events").limit(100)
    merge_drift_batch(ev, 1, str(state), DRIFT_CUTOFF)  # stale id — no-op
    assert {tuple(r) for r in read_drift(spark, str(state)).collect()} == before


def test_drift_trajectory_one_row_per_batch(spark, tmp_path):
    state = tmp_path / "drift"
    _replay(spark, state, n_batches=4)
    traj = sorted(
        (r.batch_id, r.tv_ppm) for r in drift_trajectory(spark, str(state)).collect()
    )
    assert [b for b, _ in traj] == [0, 1, 2, 3]
    # early in-order batches have an empty current window → null tv
    # (not a division error, not fake 100% drift); later ones report
    assert traj[0][1] is None
    assert traj[-1][1] is not None and traj[-1][1] >= 0


def test_drift_uncheckpointed_restart_refused(spark, tmp_path):
    """The counts-meta applied-batch marker is only valid while batch
    ids keep increasing; an uncheckpointed restart over existing drift
    state must be refused at construction."""
    import pytest

    from flink_assignment_spark.streaming.drift_stream import incremental_drift

    state = tmp_path / "drift"
    _replay(spark, state, n_batches=1)
    dummy = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_drift(dummy, str(state), DRIFT_CUTOFF)

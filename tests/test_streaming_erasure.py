"""Streaming erasure propagation: tombstones fold incrementally, the
gate drops erased subjects' records, the retro-purge removes them from
a LIVE downstream state table (the decay feature store) by rewriting
only the touched buckets, and uncheckpointed restarts are refused."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import DECAY_ASOF
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.decay_stream import (
    _bucket as decay_bucket,
    _counts_path as decay_counts_path,
    merge_decay_batch,
    read_decay,
)
from flink_assignment_spark.streaming.erasure_stream import (
    gate_batch,
    merge_tombstone_batch,
    purge_bucketed_state,
    read_tombstones,
)

from .conftest import SF_DIR

REQ_SCHEMA = "user_id long"


def test_tombstones_fold_and_gate(spark, tmp_path):
    state = tmp_path / "erasure"
    merge_tombstone_batch(spark.createDataFrame([(3,), (7,)], REQ_SCHEMA), 0, str(state))
    merge_tombstone_batch(spark.createDataFrame([(7,), (11,)], REQ_SCHEMA), 1, str(state))
    tombs = {r.user_id for r in read_tombstones(spark, str(state)).collect()}
    assert tombs == {3, 7, 11}  # deduped across batches
    ev = load_table(spark, SF_DIR, "events")
    kept = gate_batch(ev, str(state))
    kept_users = {r.user_id for r in kept.select("user_id").distinct().collect()}
    assert kept_users.isdisjoint(tombs)
    assert kept.count() == ev.filter(~F.col("user_id").isin(3, 7, 11)).count()


def test_retro_purge_of_live_decay_state(spark, tmp_path):
    """Composition: erase a user from the decay feature store — only
    the tombstone's buckets rewrite, the user vanishes from the served
    scores, and every other user's score is bit-identical."""
    decay_state = tmp_path / "decay"
    ev = load_table(spark, SF_DIR, "events")
    merge_decay_batch(ev, 0, str(decay_state))
    before = {r.user_id: (r.decay_score, r.n_events)
              for r in read_decay(spark, str(decay_state), DECAY_ASOF).collect()}
    victim = sorted(before)[0]

    er_state = tmp_path / "erasure"
    merge_tombstone_batch(
        spark.createDataFrame([(victim,)], REQ_SCHEMA), 0, str(er_state)
    )
    purge_bucketed_state(
        spark,
        decay_counts_path(str(decay_state)),
        "bucket",
        decay_bucket,
        str(er_state),
    )
    after = {r.user_id: (r.decay_score, r.n_events)
             for r in read_decay(spark, str(decay_state), DECAY_ASOF).collect()}
    assert victim not in after
    assert after == {u: v for u, v in before.items() if u != victim}


def test_purge_is_idempotent(spark, tmp_path):
    decay_state = tmp_path / "decay"
    merge_decay_batch(load_table(spark, SF_DIR, "events"), 0, str(decay_state))
    er_state = tmp_path / "erasure"
    merge_tombstone_batch(spark.createDataFrame([(1,)], REQ_SCHEMA), 0, str(er_state))
    args = (
        spark,
        decay_counts_path(str(decay_state)),
        "bucket",
        decay_bucket,
        str(er_state),
    )
    purge_bucketed_state(*args)
    once = {tuple(r) for r in read_decay(spark, str(decay_state), DECAY_ASOF).collect()}
    purge_bucketed_state(*args)
    assert {tuple(r) for r in read_decay(spark, str(decay_state), DECAY_ASOF).collect()} == once


def test_erasure_uncheckpointed_restart_refused(spark, tmp_path):
    import pytest

    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.erasure_stream import (
        incremental_tombstones,
    )

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 2)
    dummy = spark.createDataFrame([(1,)], REQ_SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_tombstones(dummy, state_dir)


def test_gate_passes_through_before_first_tombstone(spark, tmp_path):
    """A gate wired into a pipeline BEFORE any delete request has
    landed must pass records through unchanged — an empty tombstone
    set is a normal state, not an error (r14 ADVICE: the old raise
    crashed the foreachBatch sink)."""
    ev = load_table(spark, SF_DIR, "events").limit(20)
    kept = gate_batch(ev, str(tmp_path / "never-written"))
    assert kept.count() == ev.count()

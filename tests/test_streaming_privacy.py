"""Streaming k-anonymity holdback gate: released set == batch
k_suppress on everything seen (the monotone-groups parity contract),
backlog flushes the moment a group crosses k, replays and crash
windows converge, uncheckpointed restarts are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.privacy import k_suppress
from flink_assignment_spark.streaming.privacy_stream import (
    merge_kanon_batch,
    read_pending,
    read_released,
)

K = 3
QUASI = ["nat", "seg"]
SCHEMA = "rid long, nat int, seg string, payload string"


def _rows():
    """4 groups: (0,'a') size 5, (0,'b') size 3, (1,'a') size 2,
    (1,'b') size 1 — two open at k=3, two withheld forever."""
    rows = []
    rid = 0
    for nat, seg, n in [(0, "a", 5), (0, "b", 3), (1, "a", 2), (1, "b", 1)]:
        for _ in range(n):
            rows.append((rid, nat, seg, f"p{rid}"))
            rid += 1
    # interleave groups across batches
    return rows[::2] + rows[1::2]


def _released(spark, state):
    return {
        (r.rid, r.nat, r.seg)
        for r in read_released(spark, str(state), "rid").collect()
    }


def _suppress_set(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r.rid, r.nat, r.seg) for r in k_suppress(df, QUASI, K).collect()}


def test_kanon_stream_matches_batch_suppress(spark, tmp_path):
    rows = _rows()
    state = tmp_path / "kanon"
    per = 4
    for b in range(0, (len(rows) + per - 1) // per):
        chunk = rows[b * per : (b + 1) * per]
        merge_kanon_batch(
            spark.createDataFrame(chunk, SCHEMA), b, str(state), QUASI, K, "rid"
        )
    assert _released(spark, state) == _suppress_set(spark, rows)
    # withheld rows sit in pending, none of them from open groups
    pend = read_pending(spark, str(state))
    pend_groups = {(r.nat, r.seg) for r in pend.collect()}
    assert pend_groups <= {(1, "a"), (1, "b")}


def test_kanon_backlog_flushes_on_kth_arrival(spark, tmp_path):
    state = tmp_path / "kanon"
    g = [(i, 7, "x", f"p{i}") for i in range(K)]
    merge_kanon_batch(spark.createDataFrame(g[:2], SCHEMA), 0, str(state), QUASI, K, "rid")
    # under k: all held, nothing released yet (no released/ table)
    with pytest.raises(ValueError, match="nothing released"):
        read_released(spark, str(state), "rid")
    assert {r.rid for r in read_pending(spark, str(state)).collect()} == {0, 1}
    merge_kanon_batch(spark.createDataFrame(g[2:], SCHEMA), 1, str(state), QUASI, K, "rid")
    # the k-th arrival releases the backlog AND itself, same batch
    got = read_released(spark, str(state), "rid").collect()
    assert {r.rid for r in got} == {0, 1, 2}
    assert {r.batch_id for r in got} == {1}
    # later members of an open group pass straight through
    merge_kanon_batch(
        spark.createDataFrame([(99, 7, "x", "p99")], SCHEMA), 2, str(state), QUASI, K, "rid"
    )
    assert 99 in {r.rid for r in read_released(spark, str(state), "rid").collect()}


def test_kanon_replay_idempotent(spark, tmp_path):
    rows = _rows()
    state = tmp_path / "kanon"
    merge_kanon_batch(spark.createDataFrame(rows[:6], SCHEMA), 0, str(state), QUASI, K, "rid")
    merge_kanon_batch(spark.createDataFrame(rows[6:], SCHEMA), 1, str(state), QUASI, K, "rid")
    before = _released(spark, state)
    pend_before = {r.rid for r in read_pending(spark, str(state)).collect()}
    # full redelivery of an applied batch: marker no-op
    merge_kanon_batch(spark.createDataFrame(rows[:6], SCHEMA), 1, str(state), QUASI, K, "rid")
    assert _released(spark, state) == before
    assert {r.rid for r in read_pending(spark, str(state)).collect()} == pend_before


def test_kanon_crash_window_convergence(spark, tmp_path):
    """Crash after the full fold but before the marker: redelivery
    must not double-count arrivals already folded into pending (a
    group must NOT open early), and the final state equals the
    never-crashed run."""
    state = tmp_path / "crash"
    ref = tmp_path / "ref"
    g = [(i, 7, "x", f"p{i}") for i in range(4)]
    # batch 0: two members (held). Crash loses the marker; batch 0
    # redelivers. Without the strictly-new-arrivals fence the replay
    # would count them twice (2 pending + 2 arrivals = 4 >= 3) and
    # open the group with only TWO real members.
    merge_kanon_batch(spark.createDataFrame(g[:2], SCHEMA), 0, str(state), QUASI, K, "rid")
    os.remove(os.path.join(str(state), "_applied_batch"))
    merge_kanon_batch(spark.createDataFrame(g[:2], SCHEMA), 0, str(state), QUASI, K, "rid")
    with pytest.raises(ValueError, match="nothing released"):
        read_released(spark, str(state), "rid")
    merge_kanon_batch(spark.createDataFrame(g[2:], SCHEMA), 1, str(state), QUASI, K, "rid")

    merge_kanon_batch(spark.createDataFrame(g[:2], SCHEMA), 0, str(ref), QUASI, K, "rid")
    merge_kanon_batch(spark.createDataFrame(g[2:], SCHEMA), 1, str(ref), QUASI, K, "rid")
    assert _released(spark, state) == _released(spark, ref)
    def _pending_ids(st):
        p = read_pending(spark, str(st))
        return set() if p is None else {r.rid for r in p.collect()}

    assert _pending_ids(state) == _pending_ids(ref) == set()


def test_kanon_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.privacy_stream import incremental_kanon

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 1)
    dummy = spark.createDataFrame([(1, 0, "a", "p")], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_kanon(dummy, state_dir, QUASI, K, "rid")

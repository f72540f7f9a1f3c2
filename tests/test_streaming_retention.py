"""Streaming cohort retention == batch q148 under any batching or
arrival order; a late event that moves a user's cohort EARLIER revises
the whole table exactly; crash-window replays converge;
uncheckpointed restarts are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.retention_stream import (
    merge_retention_batch,
    read_retention,
)

from .conftest import SF_DIR

EV_SCHEMA = "ts timestamp, user_id long"


def _stream_set(spark, state):
    return {
        (r.cohort, r.weeks_since, r.n_active, r.cohort_size, r.retention)
        for r in read_retention(spark, str(state)).collect()
    }


def _replay(spark, state, rows, n_batches=3, shuffle=False):
    if shuffle:
        rows = rows[1::2] + rows[0::2]
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_retention_batch(
                spark.createDataFrame(chunk, EV_SCHEMA), b, str(state)
            )


def test_retention_stream_matches_batch_q148(spark, tmp_path):
    """Full-fixture parity: the derived stream table equals q148's
    batch answer, under in-order AND shuffled arrival."""
    want = {
        (r.cohort, r.weeks_since, r.n_active, r.cohort_size, r.retention)
        for r in REGISTRY["q148_cohort_retention"].spark(spark, SF_DIR).collect()
    }
    rows = [
        (r.ts, r.user_id)
        for r in load_table(spark, SF_DIR, "events").select("ts", "user_id").collect()
    ]
    for shuffle in (False, True):
        state = tmp_path / f"ret{int(shuffle)}"
        _replay(spark, state, rows, n_batches=3, shuffle=shuffle)
        assert _stream_set(spark, state) == want


def test_retention_late_event_moves_cohort_earlier(spark, tmp_path):
    """First-seen is a min-fold: a late event 5 weeks BEFORE a user's
    known first activity re-cohorts them — shifting their weeks_since
    cells and both cohorts' sizes. The derived table must equal a
    from-scratch batch over all events after the late arrival."""
    from datetime import datetime

    def ts(week, dow=0):
        # week w = days since 1970-01-05 Monday, integer weeks
        from datetime import timedelta

        return datetime(1970, 1, 5) + timedelta(days=7 * week + dow)

    early = [(ts(10), 1), (ts(12), 1), (ts(10), 2)]
    late = [(ts(5), 1)]  # user 1's true cohort is week 5
    state = tmp_path / "ret"
    merge_retention_batch(spark.createDataFrame(early, EV_SCHEMA), 0, str(state))
    before = _stream_set(spark, state)
    # before the late event: both users cohort at week 10
    assert (10, 0, 2, 2, 1.0) in before
    merge_retention_batch(spark.createDataFrame(late, EV_SCHEMA), 1, str(state))
    got = _stream_set(spark, state)
    want = {
        # user 1: cohort 5, active at weeks 5/10/12 → since 0, 5, 7
        (5, 0, 1, 1, 1.0),
        (5, 5, 1, 1, 1.0),
        (5, 7, 1, 1, 1.0),
        # user 2: cohort 10, alone now
        (10, 0, 1, 1, 1.0),
    }
    assert got == want


def test_retention_crash_window_converges(spark, tmp_path):
    """Replay after a completed fold whose marker was lost: the
    set-union fold converges to the never-crashed state."""
    rows = [
        (r.ts, r.user_id)
        for r in load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 30)
        .select("ts", "user_id")
        .collect()
    ]
    half = len(rows) // 2
    ref = tmp_path / "ref"
    _replay(spark, ref, rows, n_batches=2)
    want = _stream_set(spark, ref)

    crash = tmp_path / "crash"
    merge_retention_batch(spark.createDataFrame(rows[:half], EV_SCHEMA), 0, str(crash))
    merge_retention_batch(spark.createDataFrame(rows[half:], EV_SCHEMA), 1, str(crash))
    os.remove(os.path.join(str(crash), "_applied_batch"))
    merge_retention_batch(spark.createDataFrame(rows[half:], EV_SCHEMA), 1, str(crash))
    assert _stream_set(spark, crash) == want


def test_retention_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.retention_stream import (
        incremental_retention,
    )

    state = str(tmp_path / "ret")
    os.makedirs(state, exist_ok=True)
    commit_marker(state, 1)
    dummy = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_retention(dummy, state)


def test_retention_rtbf_purge_equals_rebuild_without(spark, tmp_path):
    """Right-to-be-forgotten composition: erase a user from the live
    retention state via the generic bucketed purge — the user's
    cohort contribution vanishes (including the cohort SIZE
    denominator), every other cell equals a from-scratch rebuild
    without the subject, and only the tombstone's bucket rewrites."""
    from flink_assignment_spark.streaming.erasure_stream import (
        merge_tombstone_batch,
        purge_bucketed_state,
    )
    from flink_assignment_spark.streaming.retention_stream import (
        N_BUCKETS as RET_BUCKETS,
    )

    rows = [
        (r.ts, r.user_id)
        for r in load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 25)
        .select("ts", "user_id")
        .collect()
    ]
    state = tmp_path / "ret"
    _replay(spark, state, rows, n_batches=2)
    victim = rows[0][1]

    er = tmp_path / "erasure"
    merge_tombstone_batch(
        spark.createDataFrame([(int(victim),)], "user_id long"), 0, str(er)
    )
    purge_bucketed_state(
        spark,
        os.path.join(str(state), "userweeks"),
        "bucket",
        lambda u: F.pmod(F.xxhash64(u, F.lit("retention")), F.lit(RET_BUCKETS)).cast("int"),
        str(er),
    )
    got = _stream_set(spark, state)

    survivors = [r for r in rows if r[1] != victim]
    want_state = tmp_path / "rebuild"
    _replay(spark, want_state, survivors, n_batches=2)
    assert got == _stream_set(spark, want_state)

"""Streaming SCD2 == batch q127 under in-order replay; open intervals
extend across batches without closing; replays and the
post-swap-pre-marker crash window converge."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_assignment_spark.operators.timeseries import scd2_intervals
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.scd2_stream import (
    merge_scd2_batch,
    read_scd2,
)

from .conftest import SF_DIR


def _batch_rows(spark):
    """The batch operator's answer on the sf0.001 events table."""
    ev = load_table(spark, SF_DIR, "events")
    return {
        (r.key, r.state, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_intervals(ev, "user_id", "event_type", "ts", "event_id").collect()
    }


def _stream_rows(spark, state_dir):
    return {
        (r.key, r.state, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in read_scd2(spark, str(state_dir)).collect()
    }


def _replay(spark, state_dir, n_batches=3):
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id").collect()
    per = (len(ev) + n_batches - 1) // n_batches
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    for b in range(n_batches):
        chunk = ev[b * per : (b + 1) * per]
        if not chunk:
            continue
        bdf = spark.createDataFrame(chunk, schema)
        merge_scd2_batch(bdf, b, str(state_dir))


def test_scd2_stream_matches_batch(spark, tmp_path):
    state = tmp_path / "scd2"
    _replay(spark, state, n_batches=3)
    assert _stream_rows(spark, state) == _batch_rows(spark)


def test_scd2_open_interval_survives_quiet_batch(spark, tmp_path):
    """A batch where a key's state does NOT change must neither close
    its interval nor bump its version — the open row just re-records
    as_of_batch."""
    state = tmp_path / "scd2"
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    b0 = spark.createDataFrame(
        [(0, t, 1, "view", 0.0, "{}"), (1, t + h, 1, "click", 0.0, "{}")], schema
    )
    b1 = spark.createDataFrame([(2, t + 2 * h, 1, "click", 0.0, "{}")], schema)
    b2 = spark.createDataFrame([(3, t + 3 * h, 1, "error", 0.0, "{}")], schema)
    merge_scd2_batch(b0, 0, str(state))
    merge_scd2_batch(b1, 1, str(state))  # continuation — no new interval
    rows = sorted(_stream_rows(spark, state), key=lambda r: r[4])
    assert [(r[1], r[4], r[5]) for r in rows] == [("view", 1, 0), ("click", 2, 1)]
    assert rows[1][2] == t + h  # click interval kept its ORIGINAL valid_from
    merge_scd2_batch(b2, 2, str(state))
    rows = sorted(_stream_rows(spark, state), key=lambda r: r[4])
    assert [(r[1], r[4], r[5]) for r in rows] == [
        ("view", 1, 0),
        ("click", 2, 0),
        ("error", 3, 1),
    ]
    assert rows[1][3] == t + 3 * h  # click closed exactly at the change


def test_scd2_marker_skips_full_redelivery(spark, tmp_path):
    state = tmp_path / "scd2"
    _replay(spark, state, n_batches=2)
    before = _stream_rows(spark, state)
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id").limit(10)
    merge_scd2_batch(ev, 0, str(state))  # stale batch id — marker skip
    assert _stream_rows(spark, state) == before


def test_scd2_crash_window_converges(spark, tmp_path):
    """Crash AFTER the current swap but BEFORE the marker: the replay
    sees post-batch open rows. The as_of_batch guard must exclude the
    already-applied keys so the replay neither double-advances
    versions nor emits backwards intervals."""
    state = tmp_path / "scd2"
    _replay(spark, state, n_batches=3)
    expected = _stream_rows(spark, state)
    marker = os.path.join(str(state), "_applied_batch")
    os.remove(marker)  # simulate the lost marker — batch 2 redelivers
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id").collect()
    per = (len(ev) + 2) // 3
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    last = spark.createDataFrame(ev[2 * per :], schema)
    merge_scd2_batch(last, 2, str(state))
    assert _stream_rows(spark, state) == expected


def test_scd2_versions_contiguous_and_single_current(spark, tmp_path):
    state = tmp_path / "scd2"
    _replay(spark, state, n_batches=4)
    rows = read_scd2(spark, str(state)).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.key, []).append(r)
    for key, rs in by_key.items():
        rs = sorted(rs, key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1)), key
        assert sum(r.is_current for r in rs) == 1
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.state != b.state


def test_scd2_stream_null_state_matches_batch(spark, tmp_path):
    """NULL-state transitions across a batch boundary: the stream's
    null-safe run collapse and merge check must agree with the batch
    operator (NULL opens an interval; NULL→NULL continues one — even
    when the continuation arrives in a later batch)."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    b0 = [
        (1, t(0), 7, "A", 0.0, None),
        (2, t(1), 7, None, 0.0, None),  # open NULL interval at batch end
        (5, t(0), 8, None, 0.0, None),
    ]
    b1 = [
        (3, t(2), 7, None, 0.0, None),  # NULL→NULL across the boundary
        (4, t(3), 7, "A", 0.0, None),
        (6, t(1), 8, "B", 0.0, None),
    ]
    state = tmp_path / "scd2null"
    merge_scd2_batch(spark.createDataFrame(b0, schema), 0, str(state))
    merge_scd2_batch(spark.createDataFrame(b1, schema), 1, str(state))
    ev = spark.createDataFrame(b0 + b1, schema)
    want = {
        (r.key, r.state, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_intervals(ev, "user_id", "event_type", "ts", "event_id").collect()
    }
    assert _stream_rows(spark, state) == want

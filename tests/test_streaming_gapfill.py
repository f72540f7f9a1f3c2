"""Streaming gap fill == batch q126 under in-order replay; gaps
spanning batch boundaries carry the frontier value; replays and the
crash window converge."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from flink_assignment_spark.operators.timeseries import gapfill_locf
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.gapfill_stream import (
    merge_gapfill_batch,
    read_filled,
)

from .conftest import SF_DIR

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _batch_rows(spark):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < 10)
    return {
        (r.key, r.bucket_ts, r.filled_value, r.is_observed)
        for r in gapfill_locf(ev, "user_id", "ts", "value", "event_id").collect()
    }


def _stream_rows(spark, state_dir):
    return {
        (r.key, r.bucket_ts, r.filled_value, r.is_observed)
        for r in read_filled(spark, str(state_dir)).collect()
    }


def _replay(spark, state_dir, n_batches=3):
    ev = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 10)
        .orderBy("ts", "event_id")
        .collect()
    )
    per = (len(ev) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = ev[b * per : (b + 1) * per]
        if chunk:
            merge_gapfill_batch(
                spark.createDataFrame(chunk, SCHEMA), b, str(state_dir)
            )


def test_gapfill_stream_matches_batch(spark, tmp_path):
    state = tmp_path / "gf"
    _replay(spark, state, n_batches=3)
    assert _stream_rows(spark, state) == _batch_rows(spark)


def test_gapfill_cross_batch_gap_carries_frontier(spark, tmp_path):
    """A gap that spans the batch boundary fills from the FRONTIER
    value (state), not from anything inside the new batch."""
    state = tmp_path / "gf"
    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    b0 = spark.createDataFrame([(0, t, 1, "view", 5.0, "{}")], SCHEMA)
    # next observation 4 hours later, in a later batch
    b1 = spark.createDataFrame([(1, t + 4 * h, 1, "view", 9.0, "{}")], SCHEMA)
    merge_gapfill_batch(b0, 0, str(state))
    merge_gapfill_batch(b1, 1, str(state))
    rows = sorted(_stream_rows(spark, state), key=lambda r: r[1])
    assert [(r[2], r[3]) for r in rows] == [
        (5.0, 1),
        (5.0, 0),
        (5.0, 0),
        (5.0, 0),
        (9.0, 1),
    ]


def test_gapfill_replay_converges(spark, tmp_path):
    state = tmp_path / "gf"
    _replay(spark, state, n_batches=3)
    expected = _stream_rows(spark, state)
    # stale redelivery — marker skip
    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < 10).limit(5)
    merge_gapfill_batch(ev, 0, str(state))
    assert _stream_rows(spark, state) == expected
    # lost-marker replay of the last batch — as_of guard + reader dedup
    os.remove(os.path.join(str(state), "_applied_batch"))
    rows = (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 10)
        .orderBy("ts", "event_id")
        .collect()
    )
    per = (len(rows) + 2) // 3
    merge_gapfill_batch(
        spark.createDataFrame(rows[2 * per :], SCHEMA), 2, str(state)
    )
    assert _stream_rows(spark, state) == expected


def test_gapfill_stale_only_batch_is_a_noop(spark, tmp_path):
    """Observations at or before the frontier are ignored (documented
    in-order contract) instead of crashing the sequence() spine."""
    state = tmp_path / "gf"
    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    merge_gapfill_batch(
        spark.createDataFrame([(0, t + 2 * h, 1, "view", 5.0, "{}")], SCHEMA),
        0,
        str(state),
    )
    before = _stream_rows(spark, state)
    merge_gapfill_batch(
        spark.createDataFrame([(1, t, 1, "view", 7.0, "{}")], SCHEMA),
        1,
        str(state),
    )
    assert _stream_rows(spark, state) == before


def test_gapfill_bucket_spanning_batches_latest_wins(spark, tmp_path):
    """One hour bucket observed in TWO micro-batches: the later
    (larger-ts) observation must override the already-emitted row —
    the same 'last observation in bucket wins' rule the batch kernel
    applies within one pass."""
    state = tmp_path / "gf"
    t = dt.datetime(2024, 1, 1, 12, 10)
    m = dt.timedelta(minutes=20)
    merge_gapfill_batch(
        spark.createDataFrame([(0, t, 1, "view", 5.0, "{}")], SCHEMA), 0, str(state)
    )
    merge_gapfill_batch(
        spark.createDataFrame([(1, t + m, 1, "view", 8.0, "{}")], SCHEMA),
        1,
        str(state),
    )
    rows = sorted(_stream_rows(spark, state), key=lambda r: r[1])
    assert len(rows) == 1
    assert rows[0][2] == 8.0 and rows[0][3] == 1
    # and the frontier carries 8.0 into the next gap
    merge_gapfill_batch(
        spark.createDataFrame(
            [(2, t + dt.timedelta(hours=2), 1, "view", 3.0, "{}")], SCHEMA
        ),
        2,
        str(state),
    )
    rows = sorted(_stream_rows(spark, state), key=lambda r: r[1])
    assert [(r[2], r[3]) for r in rows] == [(8.0, 1), (8.0, 0), (3.0, 1)]


def test_gapfill_first_batch_value_type_preserved(spark, tmp_path):
    """The no-prior-state branch must carry the observation's value
    type into f_value: a bigint value column stays bigint in the
    emitted series across the fresh-state and from-state batches (no
    double coercion / schema drift, the r13-ADVICE cast bug)."""
    import datetime as dt

    schema = "event_id long, ts timestamp, user_id long, val long"
    t = lambda h: dt.datetime(2024, 1, 1, h)
    state = tmp_path / "gf"
    merge_gapfill_batch(
        spark.createDataFrame([(1, t(0), 5, 10), (2, t(2), 5, 12)], schema),
        0,
        str(state),
        value_col="val",
    )
    merge_gapfill_batch(
        spark.createDataFrame([(3, t(5), 5, 20)], schema),
        1,
        str(state),
        value_col="val",
    )
    filled = read_filled(spark, str(state))
    assert filled.schema["filled_value"].dataType.simpleString() == "bigint"
    got = {
        (r.bucket_ts.hour, r.filled_value, r.is_observed) for r in filled.collect()
    }
    assert got == {
        (0, 10, 1), (1, 10, 0), (2, 12, 1),
        (3, 12, 0), (4, 12, 0), (5, 20, 1),
    }

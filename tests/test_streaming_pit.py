"""Streaming point-in-time lookup == batch q141 under in-order replay
(the SCD2 stream maintains the dimension, the PIT stream resolves each
batch's purchases against it); replays are marker no-ops; restarts
without a checkpoint are refused."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.pit_stream import (
    merge_pit_batch,
    read_pit_results,
)
from flink_assignment_spark.streaming.scd2_stream import merge_scd2_batch

from .conftest import SF_DIR

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _replay(spark, scd2_state, pit_state, n_batches=3):
    """The orchestration contract: per batch, fold the dimension FIRST,
    then resolve the batch's facts against it."""
    ev = load_table(spark, SF_DIR, "events").orderBy("ts", "event_id").collect()
    per = (len(ev) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = ev[b * per : (b + 1) * per]
        if not chunk:
            continue
        bdf = spark.createDataFrame(chunk, SCHEMA)
        merge_scd2_batch(bdf, b, str(scd2_state))
        merge_pit_batch(
            bdf.filter(F.col("event_type") == "purchase"),
            b,
            str(pit_state),
            str(scd2_state),
        )


def _stream_rows(spark, pit_state):
    return {
        tuple(r) for r in read_pit_results(spark, str(pit_state)).collect()
    }


def _batch_rows(spark):
    return {
        tuple(r)
        for r in REGISTRY["q141_pit_prior_state"].spark(spark, SF_DIR).collect()
    }


def test_pit_stream_matches_batch_q141(spark, tmp_path):
    _replay(spark, tmp_path / "scd2", tmp_path / "pit", n_batches=3)
    want = _batch_rows(spark)
    assert want
    assert _stream_rows(spark, tmp_path / "pit") == want


def test_pit_cross_batch_lookup(spark, tmp_path):
    """A purchase in a LATER batch resolves against a run opened in an
    EARLIER batch — the dimension state carries across."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    b0 = [(1, t(0), 7, "view", 0.0, None)]
    b1 = [(2, t(5), 7, "purchase", 0.0, None)]
    scd2, pit = tmp_path / "scd2", tmp_path / "pit"
    for b, rows in enumerate([b0, b1]):
        bdf = spark.createDataFrame(rows, SCHEMA)
        merge_scd2_batch(bdf, b, str(scd2))
        merge_pit_batch(
            bdf.filter(F.col("event_type") == "purchase"), b, str(pit), str(scd2)
        )
    got = _stream_rows(spark, pit)
    # 2024-01-01T00:05Z = 1704067200s + 300s, in µs
    assert got == {(2, 7, 1704067500000000, "view", 1)}


def test_pit_marker_skips_redelivery(spark, tmp_path):
    scd2, pit = tmp_path / "scd2", tmp_path / "pit"
    _replay(spark, scd2, pit, n_batches=3)
    before = _stream_rows(spark, pit)
    ev = load_table(spark, SF_DIR, "events").limit(30).collect()
    merge_pit_batch(
        spark.createDataFrame(ev, SCHEMA).filter(F.col("event_type") == "purchase"),
        1,
        str(pit),
        str(scd2),
    )
    assert _stream_rows(spark, pit) == before


def test_pit_uncheckpointed_restart_refused(spark, tmp_path):
    import pytest

    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.pit_stream import incremental_pit

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 2)
    dummy = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_pit(dummy, state_dir, str(tmp_path / "scd2"))

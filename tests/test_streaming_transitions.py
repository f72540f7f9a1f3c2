"""Streaming Markov transition counts == batch q145 on in-order
replays (boundary pairs included); the reorder buffer manufactures
the in-order contract from an out-of-order source (composition test);
replays and crash windows converge; restarts are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.transitions_stream import (
    merge_transitions_batch,
    read_transitions,
)

from .conftest import SF_DIR

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _events(spark, n_users=40):
    return (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < n_users)
        .select("event_id", "ts", "user_id", "event_type")
    )


def _stream_set(spark, state):
    return {
        (r.from_type, r.to_type, r.n, r.prob)
        for r in read_transitions(spark, str(state)).collect()
    }


def _batch_set(spark, df):
    import tempfile

    d = tempfile.mkdtemp()
    df.select(
        "event_id", "ts", "user_id", "event_type",
        F.lit(0.0).alias("value"), F.lit("").alias("props"),
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return {
        (r.from_type, r.to_type, r.n, r.prob)
        for r in REGISTRY["q145_event_transitions"].spark(spark, d).collect()
    }


def _inorder_batches(rows, n):
    """Split by global event time — in-order per user across batches."""
    rows = sorted(rows, key=lambda r: (r[1], r[0]))
    per = (len(rows) + n - 1) // n
    return [rows[i * per : (i + 1) * per] for i in range(n)]


def test_transitions_stream_matches_batch(spark, tmp_path):
    ev = _events(spark)
    rows = [tuple(r) for r in ev.collect()]
    state = tmp_path / "tr"
    for b, chunk in enumerate(_inorder_batches(rows, 4)):
        if chunk:
            merge_transitions_batch(
                spark.createDataFrame(chunk, EV_SCHEMA), b, str(state)
            )
    want = _batch_set(spark, ev)
    assert want and _stream_set(spark, state) == want


def test_transitions_boundary_pair_counted(spark, tmp_path):
    """A user's last event of batch 0 and first event of batch 1 form
    a transition — the frontier carry."""
    state = tmp_path / "tr"
    b0 = [(1, "2024-01-01 10:00:00", 7, "view")]
    b1 = [(2, "2024-01-01 11:00:00", 7, "purchase")]

    def _df(rows):
        return spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"
        )

    merge_transitions_batch(_df(b0), 0, str(state))
    merge_transitions_batch(_df(b1), 1, str(state))
    got = _stream_set(spark, state)
    assert got == {("view", "purchase", 1, 1.0)}


def test_transitions_replay_and_crash_window_converge(spark, tmp_path):
    ev = _events(spark, 20)
    rows = [tuple(r) for r in ev.collect()]
    b = _inorder_batches(rows, 2)
    ref = tmp_path / "ref"
    for i, chunk in enumerate(b):
        merge_transitions_batch(spark.createDataFrame(chunk, EV_SCHEMA), i, str(ref))

    # full redelivery of an applied batch: marker no-op
    before = _stream_set(spark, ref)
    merge_transitions_batch(spark.createDataFrame(b[0], EV_SCHEMA), 1, str(ref))
    assert _stream_set(spark, ref) == before

    # crash after counts replace + frontier fold, marker lost: the
    # replay must not double-add counts (meta) nor corrupt the
    # frontier (latest-wins re-fold)
    state = tmp_path / "crash"
    merge_transitions_batch(spark.createDataFrame(b[0], EV_SCHEMA), 0, str(state))
    os.remove(os.path.join(str(state), "_applied_batch"))
    merge_transitions_batch(spark.createDataFrame(b[0], EV_SCHEMA), 0, str(state))
    merge_transitions_batch(spark.createDataFrame(b[1], EV_SCHEMA), 1, str(state))
    assert _stream_set(spark, state) == before


def test_transitions_compose_with_reorder_buffer(spark, tmp_path):
    """Out-of-order source → reorder buffer → transitions ≡ batch
    q145: the buffer manufactures the per-user in-order contract the
    frontier fold requires."""
    from flink_assignment_spark.streaming.reorder import reorder_buffer
    from flink_assignment_spark.streaming.transitions_stream import (
        merge_transitions_batch as fold,
    )

    ev = _events(spark, 15)
    rows = [tuple(r) for r in ev.collect()]
    # shuffle arrival order within a bounded lateness: reverse pairs
    shuffled = []
    for i in range(0, len(rows) - 1, 2):
        shuffled += [rows[i + 1], rows[i]]
    if len(rows) % 2:
        shuffled.append(rows[-1])
    # closing tick far in the future drains the buffer
    import datetime

    mx = max(r[1] for r in rows)
    # delay must exceed the corpus time span (events span ~a month)
    # so no shuffled arrival is ever late-dropped; the tick then sits
    # past max+delay so the final watermark covers every real event
    tick = (999999, mx + datetime.timedelta(days=61), 999, "view")

    d = tmp_path / "src"
    per = (len(shuffled) + 3) // 4
    for i in range(4):
        chunk = shuffled[i * per : (i + 1) * per]
        if chunk:
            spark.createDataFrame(chunk, EV_SCHEMA).write.parquet(str(d / f"b{i}"))
    spark.createDataFrame([tick], EV_SCHEMA).write.parquet(str(d / "b9"))

    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    state = tmp_path / "tr"

    def sink(batch_df, batch_id):
        fold(batch_df, batch_id, str(state))

    q = (
        reorder_buffer(stream, "user_id", "ts", "60 days")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # batch truth includes the closing tick's user (a single event,
    # no transitions) — compare against batch on rows + tick
    want = _batch_set(spark, spark.createDataFrame(rows + [tick], EV_SCHEMA))
    assert _stream_set(spark, state) == want


def test_transitions_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.transitions_stream import (
        incremental_transitions,
    )

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 1)
    dummy = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "view")],
        "event_id long, ts string, user_id long, event_type string",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type")
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_transitions(dummy, state_dir)

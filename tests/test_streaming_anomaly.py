"""Streaming rolling-anomaly monitor == batch q147 under any arrival
order; late data revises verdicts latest-wins; crash-window replays
and compaction converge; uncheckpointed restarts are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.anomaly_stream import (
    compact_daily,
    merge_anomaly_batch,
    read_anomalies,
)

from .conftest import SF_DIR

EV_SCHEMA = "ts timestamp, user_id long"


def _events(spark, n_users=40):
    return (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("user_id") < n_users)
        .select("ts", "user_id")
    )


def _stream_set(spark, state):
    return {
        (r.user_id, str(r.day), r.c, r.mean7, r.var7)
        for r in read_anomalies(spark, str(state)).collect()
    }


def _batch_set(spark, df):
    """q147's kernel applied to an arbitrary event frame (the registry
    query reads from parquet, so rebuild it on a temp dir)."""
    import tempfile

    d = tempfile.mkdtemp()
    df.select(
        F.lit(0).cast("long").alias("event_id"),
        "ts",
        "user_id",
        F.lit("x").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("").alias("props"),
    ).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return {
        (r.user_id, str(r.day), r.c, r.mean7, r.var7)
        for r in REGISTRY["q147_rolling_anomaly"].spark(spark, d).collect()
    }


def test_anomaly_stream_matches_batch_any_order(spark, tmp_path):
    ev = _events(spark)
    rows = ev.collect()
    want = _batch_set(spark, ev)
    assert want  # the fixture produces anomalies

    for tag, order in (("inorder", rows), ("shuffled", rows[1::2] + rows[0::2])):
        state = tmp_path / tag
        per = (len(order) + 2) // 3
        for b in range(3):
            chunk = order[b * per : (b + 1) * per]
            if chunk:
                merge_anomaly_batch(
                    spark.createDataFrame(chunk, EV_SCHEMA), b, str(state)
                )
        assert _stream_set(spark, state) == want, tag


def test_anomaly_late_data_revises_verdict(spark, tmp_path):
    """A spike day flagged in batch 0 un-flags once late events level
    the rest of the window — the latest-wins revision contract."""
    state = tmp_path / "late"
    mk = lambda day, n, t0: [(f"2024-01-{day:02d} 0{t0}:00:0{i%10}", 1) for i in range(n)]

    def _df(rows):
        return spark.createDataFrame(
            [(r[0], r[1]) for r in rows], "ts string, user_id long"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")

    # days 1-6 stable (5 events each), day 7 drops to 1: flagged
    # (a drop against a stable window beats 2 sample stddevs; a lone
    # spike can't flag itself — it inflates its own window's variance)
    b0 = sum((mk(d, 5, 1) for d in range(1, 7)), []) + mk(7, 1, 1)
    merge_anomaly_batch(_df(b0), 0, str(state))
    assert {int(r.day.day) for r in read_anomalies(spark, str(state)).collect()} == {7}
    # late events fill day 7 back to the stable level: verdict revised
    b1 = mk(7, 4, 2)
    merge_anomaly_batch(_df(b1), 1, str(state))
    assert read_anomalies(spark, str(state)).count() == 0


def test_anomaly_crash_window_no_double_count(spark, tmp_path):
    """Replay after the delta append (marker lost): the (user, day,
    batch_id) dedup collapses the duplicate delta — counts, and so
    verdicts, equal the never-crashed run."""
    ev = _events(spark, 20)
    rows = ev.collect()
    half = len(rows) // 2
    ref = tmp_path / "ref"
    for b, chunk in enumerate((rows[:half], rows[half:])):
        merge_anomaly_batch(spark.createDataFrame(chunk, EV_SCHEMA), b, str(ref))

    state = tmp_path / "crash"
    merge_anomaly_batch(spark.createDataFrame(rows[:half], EV_SCHEMA), 0, str(state))
    os.remove(os.path.join(str(state), "_applied_batch"))
    merge_anomaly_batch(spark.createDataFrame(rows[:half], EV_SCHEMA), 0, str(state))
    merge_anomaly_batch(spark.createDataFrame(rows[half:], EV_SCHEMA), 1, str(state))
    assert _stream_set(spark, state) == _stream_set(spark, ref)


def test_anomaly_compaction_preserves_verdicts(spark, tmp_path):
    ev = _events(spark, 20)
    rows = ev.collect()
    state = tmp_path / "cmp"
    half = len(rows) // 2
    merge_anomaly_batch(spark.createDataFrame(rows[:half], EV_SCHEMA), 0, str(state))
    compact_daily(spark, str(state))
    merge_anomaly_batch(spark.createDataFrame(rows[half:], EV_SCHEMA), 1, str(state))
    assert _stream_set(spark, state) == _batch_set(spark, ev)
    # compacting everything again changes nothing observable
    compact_daily(spark, str(state))
    daily = spark.read.option("basePath", os.path.join(str(state), "daily")).parquet(
        os.path.join(str(state), "daily")
    )
    assert daily.groupBy("user_id", "day").count().filter("count > 1").count() == 0


def test_anomaly_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.anomaly_stream import incremental_anomaly

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 3)
    dummy = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1)], "ts string, user_id long"
    ).select(F.col("ts").cast("timestamp").alias("ts"), "user_id")
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_anomaly(dummy, state_dir)

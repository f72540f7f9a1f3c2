"""Streaming funnel equals the batch funnel (q63 semantics), including
steps that complete across micro-batches, mid-funnel death by horizon
expiry, and the no-restart tombstone."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from flink_assignment_spark.operators.funnel import funnel
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.funnel_stream import funnel_stream

from .conftest import SF_DIR

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)
SCHEMA = "user_id long, event_type string, ts timestamp"
STEPS = ["signup", "click", "purchase"]
HORIZON_S = 600.0  # 10 minutes


def _rows(specs):
    """specs: (user_id, event_type, minutes_offset)"""
    return [(u, t, BASE + timedelta(minutes=m)) for u, t, m in specs]


def run_stream(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _stream_rows_as_ts(spark, name):
    """Memory-sink rows (µs longs) → {(user_id, ts, ts, ts), ...}."""
    out = spark.sql(
        "SELECT user_id, timestamp_micros(signup_us) AS signup_ts, "
        "timestamp_micros(click_us) AS click_ts, "
        "timestamp_micros(purchase_us) AS purchase_ts FROM " + name
    )
    return {tuple(r) for r in out.collect()}


def test_streaming_funnel_matches_batch(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    batch1 = _rows(
        [
            # u1 completes entirely in batch 1
            (1, "signup", 0),
            (1, "click", 5),
            (1, "purchase", 8),
            # u2: signup+click in batch 1, purchase arrives in batch 2
            (2, "signup", 0),
            (2, "click", 9),
            # u3: click BEFORE signup must not count; the later click does
            (3, "click", 0),
            (3, "signup", 1),
            (3, "click", 4),
            # u4: two signups; only the FIRST anchors the funnel, and its
            # click window expires → dead, and batch-2 restart is ignored
            (4, "signup", 0),
            (4, "signup", 2),
            # u5: click lands exactly on the horizon boundary (inclusive)
            (5, "signup", 0),
            (5, "click", 10),
            # u6: purchase before click must not count
            (6, "signup", 0),
            (6, "purchase", 3),
            (6, "click", 4),
        ]
    )
    batch2 = _rows(
        [
            (2, "purchase", 15),
            # u3 purchase within window of its minute-4 click
            (3, "purchase", 12),
            # u4's funnel died at minute 10 (no click within horizon of
            # minute-0 signup); this click+purchase chain after a fresh
            # signup must NOT emit (batch anchors on the GLOBAL min signup)
            (4, "signup", 30),
            (4, "click", 31),
            (4, "purchase", 32),
            # u5 purchase closes the boundary-click funnel
            (5, "purchase", 19),
            # u6 purchase after the (valid) click
            (6, "purchase", 6),
        ]
    )
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = funnel_stream(stream, "user_id", "ts", "event_type", STEPS, HORIZON_S)
    run_stream(out, "funnels")
    got = _stream_rows_as_ts(spark, "funnels")

    all_events = spark.createDataFrame(batch1 + batch2, SCHEMA)
    want = {
        tuple(r)
        for r in funnel(all_events, "user_id", "ts", "event_type", STEPS, HORIZON_S).collect()
    }
    assert got == want
    assert {r[0] for r in got} == {1, 2, 3, 5, 6}  # u4 dead, no restart


def test_streaming_funnel_single_batch_matches_q63_on_real_events(spark, tmp_path):
    """End-to-end on the driver-generated events table with q63's 7-day
    horizon. One micro-batch (no trigger cap) so the within-batch sort
    satisfies the in-order contract regardless of file layout."""
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    d = str(tmp_path / "real_ev")
    ev.write.parquet(d)
    horizon = 7 * 86400.0
    stream = spark.readStream.schema(SCHEMA).parquet(d)
    out = funnel_stream(stream, "user_id", "ts", "event_type", STEPS, horizon)
    run_stream(out, "funnelr")
    got = _stream_rows_as_ts(spark, "funnelr")
    want = {
        tuple(r)
        for r in funnel(ev, "user_id", "ts", "event_type", STEPS, horizon).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_funnel_dead_state_is_tombstoned(spark, tmp_path):
    """A key whose funnel dies keeps a tombstone: a full chain arriving
    later (separate micro-batch) emits nothing."""
    d = tmp_path / "tomb"
    d.mkdir()
    b1 = _rows([(9, "signup", 0), (9, "view", 20)])  # view expires the funnel
    b2 = _rows([(9, "signup", 40), (9, "click", 41), (9, "purchase", 42)])
    spark.createDataFrame(b1, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(b2, SCHEMA).coalesce(1).write.parquet(str(d / "f2"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = funnel_stream(stream, "user_id", "ts", "event_type", STEPS, HORIZON_S)
    run_stream(out, "funnelt")
    assert spark.sql("SELECT * FROM funnelt").count() == 0
    # batch agrees: min-signup funnel has no qualifying click
    all_events = spark.createDataFrame(b1 + b2, SCHEMA)
    assert funnel(all_events, "user_id", "ts", "event_type", STEPS, HORIZON_S).count() == 0

"""Streaming as-of attribution equals batch q34, including matches
that span micro-batches, timestamp ties broken by max view id, and
purchases with no prior view."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.asof_stream import asof_attribution_stream

from .conftest import SF_DIR

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)
SCHEMA = "user_id long, event_id long, event_type string, ts timestamp, value double"


def _rows(specs):
    """specs: (user_id, event_id, event_type, minutes_offset, value)"""
    return [
        (u, i, t, BASE + timedelta(minutes=m), v) for u, i, t, m, v in specs
    ]


def run_stream(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _batch_asof(spark, events_df):
    """The q34 pipeline applied to an arbitrary events frame."""
    from pyspark.sql import functions as F

    from flink_assignment_spark.operators.asof import asof_join

    purchases = events_df.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    views = events_df.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts", "value"
    )
    out = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts", tie_break="view_id"
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.col("asof_view_id").alias("view_id"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts"))).alias(
            "view_lag_us"
        ),
        F.round(F.col("asof_value"), 2).alias("view_value"),
    )


def test_streaming_asof_matches_batch_across_batches(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    batch1 = _rows(
        [
            # u1: view then purchase in batch 1; second purchase in
            # batch 2 must attribute to the SAME batch-1 view
            (1, 10, "view", 0, 1.005),
            (1, 11, "purchase", 5, 9.0),
            # u2: purchase BEFORE any view → no row ever
            (2, 20, "purchase", 1, 5.0),
            # u3: two views at the SAME timestamp — max view_id wins
            (3, 30, "view", 0, 1.0),
            (3, 31, "view", 0, 2.0),
            # u4: view and purchase at the same instant → inclusive
            (4, 40, "view", 2, 7.0),
            (4, 41, "purchase", 2, 3.0),
            # u5: click noise must be ignored
            (5, 50, "click", 0, 0.0),
            (5, 51, "view", 1, 4.0),
        ]
    )
    batch2 = _rows(
        [
            (1, 12, "purchase", 20, 2.0),
            # u3 purchase lands after the tied views
            (3, 32, "purchase", 9, 1.0),
            # u5: newer view in batch 2 overrides the batch-1 view
            (5, 52, "view", 30, 6.0),
            (5, 53, "purchase", 31, 8.0),
        ]
    )
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    run_stream(asof_attribution_stream(stream), "asofs")
    got = {tuple(r) for r in spark.sql("SELECT * FROM asofs").collect()}

    want = {
        tuple(r)
        for r in _batch_asof(spark, spark.createDataFrame(batch1 + batch2, SCHEMA)).collect()
    }
    assert got == want
    # spot-pin the tricky ones
    by_purchase = {r[0]: r for r in got}
    assert 20 not in by_purchase  # no prior view
    assert by_purchase[32][2] == 31  # ts tie → max view_id
    assert by_purchase[41][3] == 0  # same-instant view counts, lag 0
    assert by_purchase[12][2] == 10  # cross-batch attribution
    assert by_purchase[53][2] == 52  # newer view overrides state


def test_streaming_asof_single_batch_matches_q34_on_real_events(spark, tmp_path):
    """End-to-end on the driver-generated events table against the
    registry q34 query itself. One micro-batch so the within-batch
    sort satisfies the in-order contract regardless of file layout."""
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    d = str(tmp_path / "real_ev")
    ev.write.parquet(d)
    stream = spark.readStream.schema(SCHEMA).parquet(d)
    run_stream(asof_attribution_stream(stream), "asofr")
    got = {tuple(r) for r in spark.sql("SELECT * FROM asofr").collect()}
    want = {
        tuple(r)
        for r in REGISTRY["q34_asof_attribution"].spark(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0

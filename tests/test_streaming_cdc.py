"""Streaming latest-per-key CDC compaction equals batch q48 after the
full changelog replays."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.cdc_stream import latest_state_stream

from .conftest import SF_DIR


def test_latest_state_stream_matches_batch_q48(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    )
    d = tmp_path / "log"
    d.mkdir()
    # three micro-batches split by event time (in-order replay)
    cuts = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    ev.filter(F.col("event_id") <= cuts[0]).coalesce(1).write.parquet(str(d / "f1"))
    ev.filter(
        (F.col("event_id") > cuts[0]) & (F.col("event_id") <= cuts[1])
    ).coalesce(1).write.parquet(str(d / "f2"))
    ev.filter(F.col("event_id") > cuts[1]).coalesce(1).write.parquet(str(d / "f3"))

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withColumn("tus", F.unix_micros("ts"))
    )
    state = latest_state_stream(
        stream,
        key_cols=["user_id"],
        order_expr="struct(tus, event_id)",
        payload_cols=["event_id", "event_type", "tus", "value"],
    )
    q = (
        state.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cdc_state")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.user_id: (r.event_id, r.event_type, r.tus, r.value)
        for r in spark.sql("SELECT * FROM cdc_state").collect()
    }
    want = {
        r.user_id: (r.event_id, r.event_type, r.tus, r.value)
        for r in REGISTRY["q48_latest_per_key"]
        .spark(spark, SF_DIR)
        .withColumn("tus", F.unix_micros(F.to_timestamp("ts_s")))
        .select("user_id", "event_id", "event_type", "tus", "value")
        .collect()
    }
    # ts_s is second-truncated in q48; compare on the identifying cols
    got_ids = {u: (e, t, v) for u, (e, t, _, v) in got.items()}
    want_ids = {u: (e, t, v) for u, (e, t, _, v) in want.items()}
    assert got_ids == want_ids and len(want_ids) > 0

"""Streaming session windows and late-data (watermark) semantics."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType


SCHEMA = StructType(
    [StructField("user", StringType()), StructField("ts", TimestampType())]
)


def ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M").replace(tzinfo=timezone.utc)


def run(df, mode, name):
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_session_window_stream(spark, tmp_path):
    """Native streaming session windows (gap 30 min) — the streaming
    counterpart of operators.sessionize."""
    d = tmp_path / "sess"
    d.mkdir()
    rows = [
        ("u1", ts("2024-01-01 10:00")),
        ("u1", ts("2024-01-01 10:10")),  # same session
        ("u1", ts("2024-01-01 11:30")),  # new session (gap 80 min)
        ("u2", ts("2024-01-01 10:00")),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    # sentinel to advance the watermark past all session gaps
    spark.createDataFrame([("zz", ts("2024-02-01 00:00"))], SCHEMA).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    agg = stream.groupBy(F.session_window("ts", "30 minutes"), "user").agg(
        F.count("*").alias("n")
    )
    run(
        agg.select("user", F.col("session_window.start").alias("start"), "n"),
        "append",
        "sess_out",
    )
    got = {
        (r.user, r.start.strftime("%H:%M"), r.n)
        for r in spark.sql("SELECT * FROM sess_out WHERE user != 'zz'").collect()
    }
    assert got == {("u1", "10:00", 2), ("u1", "11:30", 1), ("u2", "10:00", 1)}


def test_watermark_drops_late_rows(spark, tmp_path):
    """Event-time late-data contract (the reference assumes in-order
    input; this pins down what happens when that is violated):

    - late rows whose window is still in state are MERGED (watermark
      eviction lags one batch behind watermark advancement);
    - once the window is evicted, late rows are DROPPED — visible in
      numRowsDroppedByWatermark and absent from the output."""
    d = tmp_path / "late"
    d.mkdir()
    import time as _time

    batches = [
        [("u1", ts("2024-01-01 10:00")), ("u1", ts("2024-01-01 23:59"))],
        [("u3", ts("2024-02-01 00:00"))],  # advances watermark past Jan 1
        [("u3", ts("2024-02-01 00:10"))],  # spacer: Jan windows evicted here
        [("u1", ts("2024-01-01 10:05"))],  # late, after eviction → dropped
        [("u4", ts("2024-03-01 00:00"))],  # flush
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(str(d / f"f{i}"))
        _time.sleep(1.1)  # distinct mtimes keep file-source replay order

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    agg = stream.groupBy(F.window("ts", "1 day"), "user").agg(F.count("*").alias("n"))
    q = agg.writeStream.outputMode("append").format("memory").queryName("late_out").start()
    try:
        q.processAllAvailable()
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p["stateOperators"]
        )
    finally:
        q.stop()
    got = {(r.user, r.n) for r in spark.sql("SELECT * FROM late_out WHERE user='u1'").collect()}
    assert got == {("u1", 2)}  # late 10:05 row NOT in the Jan 1 window
    assert dropped == 1


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Streaming exact dedup: dropDuplicatesWithinWatermark keeps the
    first arrival of each key and drops re-deliveries across
    micro-batches while the key is inside the watermark horizon."""
    import time as _time

    d = tmp_path / "dedup"
    d.mkdir()
    batches = [
        [("k1", ts("2024-01-01 10:00")), ("k2", ts("2024-01-01 10:01"))],
        [("k1", ts("2024-01-01 10:02"))],  # duplicate re-delivery → dropped
        [("k3", ts("2024-01-01 10:03"))],
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.parquet(str(d / f"f{i}"))
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user"])
    )
    run(stream.select("user"), "append", "dedup_out")
    got = sorted(r.user for r in spark.sql("SELECT * FROM dedup_out").collect())
    assert got == ["k1", "k2", "k3"]


def test_incremental_rollup_sink_upserts(spark, tmp_path):
    """The foreachBatch continuous-aggregate sink must converge to
    exactly the batch recomputation: trigger 1 lands hours 10 and 11;
    trigger 2 adds more rows to hour 10 (an upsert of an existing
    partition) plus a new hour 12. The final parquet table equals a
    batch groupBy over all input rows — proving refreshed partitions
    overwrite and unchanged groups survive."""
    from flink_assignment_spark.sources.sinks import incremental_rollup_sink

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    f1 = [
        ("u1", ts("2024-01-01 10:05")),
        ("u2", ts("2024-01-01 10:20")),
        ("u1", ts("2024-01-01 11:40")),
    ]
    f2 = [
        ("u3", ts("2024-01-01 10:55")),  # upserts hour 10
        ("u1", ts("2024-01-01 12:01")),  # new hour 12
    ]
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    agg = stream.groupBy(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH").alias("hour")
    ).agg(F.count("*").alias("n"))
    q = incremental_rollup_sink(agg, out, ["hour"], ckpt)
    try:
        q.processAllAvailable()
        spark.createDataFrame(f2, SCHEMA).coalesce(1).write.parquet(str(src / "f2"))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {(r.hour, r.n) for r in spark.read.parquet(out).collect()}
    assert got == {
        ("2024-01-01-10", 3),
        ("2024-01-01-11", 1),
        ("2024-01-01-12", 1),
    }


def test_events_stream_matches_batch_daily_agg(spark, tmp_path):
    """The real events table streamed file-by-file through the SAME
    windowed aggregation as the batch path must converge to the batch
    answer — the Structured Streaming unification claim, driven on
    driver-shaped data (µs-rewritten copies of sf0.001 events)."""
    from flink_assignment_spark.sources.loaders import load_table
    from flink_assignment_spark.streaming.sources import read_events_stream

    from .conftest import SF_DIR

    events = load_table(spark, SF_DIR, "events")
    d = tmp_path / "events_stream"
    # rewrite at µs precision in 3 files so the stream takes 3 triggers
    events.repartition(3).write.parquet(str(d))

    stream = read_events_stream(spark, str(d)).withWatermark("ts", "0 seconds")
    agg = (
        stream.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ev_daily")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batch = {
        (r.day, r.event_type, r.n)
        for r in events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "event_type", "n")
        .collect()
    }
    got = {(r.day, r.event_type, r.n) for r in spark.sql("SELECT * FROM ev_daily").collect()}
    assert got == batch and len(got) > 0

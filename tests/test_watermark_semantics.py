"""Late-data contract of watermarked streaming aggregation, pinned.

The reference assumes in-order streams (zero-lateness ascending
watermarks); production crawls are NOT in-order. This pins what a
nonzero watermark actually guarantees in Structured Streaming:

- a late row is DROPPED iff, when it arrives, its window's end is
  older than the watermark in force for that micro-batch;
- the watermark in force lags the data by one micro-batch: it is
  computed from batches committed BEFORE the current one (so a late
  row arriving in the very next batch after the advancing event can
  still be aggregated — sizing the delay must account for that lag);
- a late row whose window is still open is aggregated normally;
- append mode emits a window exactly once, after the watermark
  passes its end.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

BASE = datetime(2024, 6, 1, 10, 0, tzinfo=timezone.utc)
SCHEMA = "event_id long, ts timestamp"


def _write(spark, path, minutes, start):
    rows = [(start + i, BASE + timedelta(minutes=m)) for i, m in enumerate(minutes)]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(path)


def test_late_rows_drop_only_after_window_end_passes_watermark(spark, tmp_path):
    d = tmp_path / "log"
    d.mkdir()
    # b0: two rows in window [10:00,10:15) plus 11:00 → watermark
    # advances to 10:50 (committed after b0, in force from b1 on)
    _write(spark, str(d / "f1"), [0, 5, 60], 0)
    # b1: innocuous 11:05 — lets the 10:50 watermark take effect
    _write(spark, str(d / "f2"), [65], 10)
    # b2 (watermark in force 10:50): 10:05 is late and its window end
    # 10:15 < 10:50 → DROPPED; 10:48's window [10:45,11:00) ends after
    # the watermark → counted
    _write(spark, str(d / "f3"), [5, 48], 20)
    # b3: advance the watermark past every open window
    _write(spark, str(d / "f4"), [120], 30)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    counts = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("start"), "n")
    )
    q = (
        counts.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_counts")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.sql("SELECT * FROM wm_counts").collect()
    got = {r.start: r.n for r in rows}
    assert len(rows) == len(got), "append mode emitted a window twice"
    assert got == {
        "10:00": 2,  # late 10:05 dropped (window end < in-force watermark)
        "10:45": 1,  # late 10:48 aggregated (window still open)
        "11:00": 2,  # 11:00 + 11:05
    }

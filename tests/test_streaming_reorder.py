"""Reorder buffer: out-of-order events are released in event-time
order as the watermark advances, quiet keys flush via event-time
timeout, and events later than the declared bound are dropped."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from flink_assignment_spark.streaming.reorder import reorder_buffer

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)
SCHEMA = "user_id long, event_id long, ts timestamp, value double"


def _rows(specs):
    """specs: (user_id, event_id, minutes, value)"""
    return [(u, e, BASE + timedelta(minutes=m), v) for u, e, m, v in specs]


def test_reorder_buffer_full_contract(spark, tmp_path):
    d = tmp_path / "ev"
    d.mkdir()
    batches = [
        # b1: key 1 out of order within the batch (10, then 7)
        _rows([(1, 100, 10, 1.0), (1, 101, 7, 2.0)]),
        # b2: an even earlier event (3 — still >= watermark 0) and a
        # later one (20); watermark after b2 = 20 - 10 = 10
        _rows([(1, 102, 3, 3.0), (1, 103, 20, 4.0)]),
        # b3: a tick advances the watermark to 30; key 1 is NOT in
        # this batch — its buffered 3/7/10 flush via timeout. Also a
        # too-late key-1 event (5 < watermark 10) that must drop.
        _rows([(9, 900, 40, 0.0), (1, 104, 5, 9.9)]),
        # b4: tick to watermark 40 — drains key 1's minute-20 event
        _rows([(9, 901, 50, 0.0)]),
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    captured = []

    def sink(batch_df, batch_id):
        captured.extend((batch_id, tuple(r)) for r in batch_df.collect())

    q = (
        reorder_buffer(stream, "user_id", "ts", "10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    by_key: dict = {}
    for bid, row in captured:
        by_key.setdefault(row[0], []).append((bid, row))
    # the dropped-late event never surfaces
    assert all(r[1][1] != 104 for r in captured)
    # key 1: all four in-bound events emitted (set-complete)
    k1 = by_key[1]
    assert {r[1][1] for r in k1} == {100, 101, 102, 103}
    # emission spans >= 2 micro-batches (the minute-20 event can only
    # drain in a later batch, via the event-time timeout)
    bids = {bid for bid, _ in k1}
    assert len(bids) >= 2
    late_bid = max(bid for bid, r in k1 if r[1] == 103)
    assert all(bid < late_bid for bid, r in k1 if r[1] != 103)
    # within each emitted frame rows are ts-sorted (captured order),
    # and across batches a later batch never emits an earlier event
    for bid in bids:
        seq = [r[2] for b, r in k1 if b == bid]
        assert seq == sorted(seq), (bid, seq)
    for (b1, r1) in k1:
        for (b2, r2) in k1:
            if b1 < b2:
                assert r1[2] <= r2[2]


def test_reorder_then_funnel_matches_batch_on_out_of_order_events(spark, tmp_path):
    """The production topology end-to-end: out-of-order events →
    reorder buffer → (per-batch hand-off, the files/Kafka stage
    between two stateful queries) → streaming funnel. The funnel's
    in-order contract is MANUFACTURED by the buffer, and the result
    equals the batch funnel over the in-bound events."""
    from flink_assignment_spark.operators.funnel import funnel
    from flink_assignment_spark.streaming.funnel_stream import funnel_stream

    SCHEMA_F = "user_id long, event_id long, event_type string, ts timestamp, value double"

    def _ev(specs):
        return [
            (u, e, t, BASE + timedelta(minutes=m), 0.0) for u, e, t, m in specs
        ]

    d = tmp_path / "raw"
    d.mkdir()
    batches = [
        # u1's signup arrives AFTER its click (out of order in one
        # batch); u2's click arrives a batch before its signup
        _ev([(1, 1, "click", 5, ), (1, 0, "signup", 0), (2, 10, "click", 8)]),
        _ev([(2, 9, "signup", 2), (1, 2, "purchase", 9), (2, 11, "purchase", 12)]),
        _ev([(9, 90, "tick", 60)]),   # watermark drains
        _ev([(9, 91, "tick", 80)]),
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA_F).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA_F)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    handoff = tmp_path / "ordered"
    handoff.mkdir()

    def sink(batch_df, batch_id):
        rows = batch_df.collect()
        if rows:
            spark.createDataFrame(rows, batch_df.schema).coalesce(1).write.parquet(
                str(handoff / f"o{batch_id}")
            )

    q = (
        reorder_buffer(stream, "user_id", "ts", "10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stream2 = (
        spark.readStream.schema(SCHEMA_F)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(handoff) + "/*")
    )
    out = funnel_stream(
        stream2, "user_id", "ts", "event_type", ["signup", "click", "purchase"], 600.0
    )
    q2 = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("reordered_funnel")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM reordered_funnel").collect()
    }
    all_events = spark.createDataFrame(sum(batches, []), SCHEMA_F)
    want = {
        (r["user_id"],)
        + tuple(int(t.timestamp() * 1_000_000) for t in r[1:])
        for r in funnel(
            all_events, "user_id", "ts", "event_type",
            ["signup", "click", "purchase"], 600.0,
        ).collect()
    }
    assert got == want and len(want) == 2  # u1 and u2 both complete


def test_reorder_feeds_the_in_order_asof_contract(spark, tmp_path):
    """Compose: out-of-order views/purchases → reorder buffer →
    (captured per batch, i.e. the order a downstream keyed stream
    would see) equals the event-time order the as-of stream requires."""
    d = tmp_path / "ev2"
    d.mkdir()
    b0 = _rows([(5, 500, 12, 1.0), (5, 501, 4, 2.0)])
    b1 = _rows([(5, 502, 30, 3.0)])
    b2 = _rows([(9, 900, 60, 0.0)])  # drain tick
    b3 = _rows([(9, 901, 80, 0.0)])
    for i, rows in enumerate([b0, b1, b2, b3]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    seen = []

    def sink(batch_df, batch_id):
        seen.extend(
            tuple(r) for r in batch_df.filter(F.col("user_id") == 5).collect()
        )

    q = (
        reorder_buffer(stream, "user_id", "ts", "10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert [r[1] for r in seen] == [501, 500, 502]  # strict ts order


def test_nullable_int_columns_pass_through(spark, tmp_path):
    """A NULL in an integer payload column must survive the JSON
    round-trip as a true NULL, not a float64 NaN that breaks the Arrow
    conversion back to LongType (round-6 advisory): the emitted rows
    must be byte-exact, nulls included."""
    d = tmp_path / "ev"
    d.mkdir()
    schema = "user_id long, ts timestamp, cnt long, flag boolean"
    rows = [
        (1, BASE + timedelta(minutes=5), None, None),
        (1, BASE + timedelta(minutes=2), 7, True),
    ]
    tick = [(9, BASE + timedelta(minutes=60), 1, False)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(str(d / "b0"))
    spark.createDataFrame(tick, schema).coalesce(1).write.parquet(str(d / "b1"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    captured = []

    def sink(batch_df, batch_id):
        captured.extend(tuple(r) for r in batch_df.collect())

    q = (
        reorder_buffer(stream, "user_id", "ts", "1 minute")
        .writeStream.outputMode("append")
        .foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    key1 = [c for c in captured if c[0] == 1]
    assert key1 == [
        (1, BASE.replace(tzinfo=None) + timedelta(minutes=2), 7, True),
        (1, BASE.replace(tzinfo=None) + timedelta(minutes=5), None, None),
    ]

"""Batch CEP vs streaming CEP on degenerate repeated add/remove
sequences per key, pinned to Flink CEP semantics
(``begin("added").followedBy("removed").within(1 day)``, relaxed
contiguity, first-match pairing — reference
``FlinkAssignment.scala:332-347``):

- every open "added" matches the FIRST later "removed" within the
  window (two opens closed by one remove → two matches);
- a consumed "added" does not match later removes;
- a remove at the exact same timestamp as an add does NOT match it
  (strictly-after), and a remove beyond the window matches nothing.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from flink_assignment_spark.operators.cep import followed_by
from flink_assignment_spark.streaming.cep_stream import followed_by_stream

BASE = datetime(2024, 4, 1, tzinfo=timezone.utc)
SCHEMA = "repo string, filename string, status string, ts timestamp"
DAY_S = 86400.0

# (repo, filename, status, hours_offset) — one degenerate sequence per key
EVENTS = [
    # add -> add -> remove: both opens close on the one remove
    ("r1", "a.java", "added", 0),
    ("r1", "a.java", "added", 2),
    ("r1", "a.java", "removed", 5),
    # add -> remove -> add -> remove: two disjoint first-match pairs
    ("r2", "b.py", "added", 0),
    ("r2", "b.py", "removed", 1),
    ("r2", "b.py", "added", 3),
    ("r2", "b.py", "removed", 4),
    # add -> remove -> remove: the add is consumed by the FIRST remove
    ("r3", "c.js", "added", 0),
    ("r3", "c.js", "removed", 2),
    ("r3", "c.js", "removed", 6),
    # remove before any add, then add with no later remove: no match
    ("r4", "d.rs", "removed", 0),
    ("r4", "d.rs", "added", 1),
    # same-timestamp add+remove: strictly-after -> no match
    ("r5", "e.go", "added", 0),
    ("r5", "e.go", "removed", 0),
    # remove beyond the 1-day window: no match
    ("r6", "f.md", "added", 0),
    ("r6", "f.md", "removed", 25),
]

# hand-traced goldens: (repo, filename, add_hours, remove_hours)
EXPECTED = {
    ("r1", "a.java", 0, 5),
    ("r1", "a.java", 2, 5),
    ("r2", "b.py", 0, 1),
    ("r2", "b.py", 3, 4),
    ("r3", "c.js", 0, 2),
}


def _ts(hours):
    return BASE + timedelta(hours=hours)


def _hours(dt):
    return (dt.replace(tzinfo=timezone.utc) - BASE).total_seconds() / 3600


def test_batch_followed_by_degenerate_sequences(spark):
    events = spark.createDataFrame(
        [(r, f, s, _ts(h)) for r, f, s, h in EVENTS], SCHEMA
    )
    out = followed_by(
        events, ["repo", "filename"], "ts", "status", "added", "removed", DAY_S
    )
    got = {
        (r.repo, r.filename, _hours(r.first_ts), _hours(r.second_ts))
        for r in out.collect()
    }
    assert got == EXPECTED


def test_stream_matches_batch_on_degenerate_sequences(spark, tmp_path):
    """Same sequences through ``followed_by_stream``, split across two
    micro-batches at an awkward boundary (r1's remove and r2's second
    pair arrive a batch after their opens)."""
    d = tmp_path / "cepdegen"
    d.mkdir()
    cut = 7  # first 7 events in batch 1 (event-time order preserved)
    ordered = sorted(EVENTS, key=lambda e: (e[3], e[2] == "removed"))
    rows = [(r, f, s, _ts(h)) for r, f, s, h in ordered]
    # coalesce(1): one part-file per micro-batch, rows in written order
    # (multiple tiny part-files would otherwise become separate batches
    # in arbitrary file order, breaking the per-key event-time contract)
    spark.createDataFrame(rows[:cut], SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(rows[cut:], SCHEMA).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    out = followed_by_stream(
        stream, ["repo", "filename"], "ts", "status", "added", "removed", DAY_S
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("cepdg").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    us = 3_600 * 1_000_000
    base_us = int(BASE.timestamp() * 1_000_000)
    got = {
        (r.repo, r.filename, (r.first_ts_us - base_us) / us, (r.second_ts_us - base_us) / us)
        for r in spark.sql("SELECT * FROM cepdg").collect()
    }
    assert got == EXPECTED

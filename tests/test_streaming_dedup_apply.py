"""The foreachBatch kept-corpus sink maintained incrementally over
micro-batches equals the batch q62-style dedup-apply on the full input."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import exact_dedup
from flink_assignment_spark.streaming.dedup_apply import (
    incremental_dedup_apply,
    read_kept,
)

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)
SCHEMA = "doc_id long, ts timestamp, text string, lang string"


def _rows(specs):
    """specs: (doc_id, minutes_offset, text, lang)"""
    return [(i, BASE + timedelta(minutes=m), t, g) for i, m, t, g in specs]


def test_incremental_dedup_apply_matches_batch_q62(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    table = str(tmp_path / "kept")
    batch1 = _rows(
        [
            (0, 0, "alpha text", "en"),
            (1, 1, "beta text", "en"),
            (2, 2, "alpha text", "de"),  # dup within batch 1
            (3, 3, "gamma text", "fr"),
        ]
    )
    batch2 = _rows(
        [
            (4, 10, "delta text", "en"),
            (5, 11, "beta text", "en"),   # dup of a batch-1 text
            (6, 12, "delta text", "de"),  # dup within batch 2
            (7, 13, "alpha text", "en"),  # dup of a batch-1 text
            (8, 14, "alpha text", "fr"),  # third copy across batches
        ]
    )
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = incremental_dedup_apply(stream, table, carry_cols=("lang",))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {
        r.text_hash: (r.doc_id, r.lang, r.n_dups)
        for r in read_kept(spark, table).collect()
    }

    # batch q62 shape on the union: keeper = min-id doc + group size
    docs = spark.createDataFrame(batch1 + batch2, SCHEMA)
    groups = exact_dedup(docs)
    want = {
        r.text_hash: (r.doc_id, r.lang, r.n_dups)
        for r in docs.join(
            groups, (docs.doc_id == groups.keep_id) & (F.md5(docs.text) == groups.text_hash)
        ).select("text_hash", "doc_id", "lang", "n_dups").collect()
    }
    # ids ascend with arrival order, so keepers AND counts match exactly
    assert kept == want
    assert sorted(v[2] for v in kept.values()) == [1, 2, 2, 4]


def test_incremental_dedup_apply_single_batch_bootstrap(spark, tmp_path):
    """First batch creates the table from scratch (no existing dir)."""
    d = tmp_path / "docs1"
    d.mkdir()
    table = str(tmp_path / "kept1")
    rows = _rows([(0, 0, "x y", "en"), (1, 1, "x y", "en"), (2, 2, "z", "de")])
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    stream = spark.readStream.schema(SCHEMA).parquet(str(d) + "/*")
    q = incremental_dedup_apply(stream, table)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.doc_id, r.n_dups) for r in read_kept(spark, table).collect()}
    assert got == {(0, 2), (2, 1)}

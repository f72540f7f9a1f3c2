"""Streaming split assignment == batch q119 under in-order replay;
group-atomicity survives cross-batch arrival; replays are idempotent."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.split_stream import (
    incremental_split_assign,
    merge_split_batch,
    read_assignments,
)

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
N_DOCS = 12


def _write_ordered_batches(spark, rows, in_dir, per_file=1):
    in_dir.mkdir()
    for i in range(0, len(rows), per_file):
        spark.createDataFrame(rows[i : i + per_file], DOCS_SCHEMA).coalesce(
            1
        ).write.parquet(str(in_dir / f"f{i:03d}"))
        time.sleep(0.02)  # distinct mtimes keep file-source order stable


def test_streaming_split_matches_q119_in_order(spark, tmp_path):
    subset = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .filter(F.col("doc_id") < N_DOCS)
        .orderBy("doc_id")
        .collect()
    )
    assert len(subset) == N_DOCS

    oracle_dir = str(tmp_path / "oracle_sf")
    spark.createDataFrame(subset, DOCS_SCHEMA).write.parquet(
        os.path.join(oracle_dir, "documents.parquet")
    )
    want = {
        r.doc_id: (r.source, r.group_id, r.split)
        for r in REGISTRY["q119_split_assign"].spark(spark, oracle_dir).collect()
    }

    in_dir = tmp_path / "in"
    _write_ordered_batches(spark, subset, in_dir, per_file=3)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(in_dir) + "/*")
    )
    q = incremental_split_assign(stream, state_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.doc_id: (r.source, r.group_id, r.split)
        for r in read_assignments(spark, state_dir).collect()
    }
    assert got == want


def test_split_group_atomic_across_batches(spark, tmp_path):
    """A doc arriving in a LATER batch with a known canonical text
    inherits the existing group's id and split (never re-routes)."""
    state_dir = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(1, "Alpha beta gamma!", "en", "web", 17), (2, "unrelated words here", "en", "web", 20)],
        DOCS_SCHEMA,
    )
    # same canonical text as doc 1 (punctuation/case differ), higher id
    b1 = spark.createDataFrame(
        [(99, "  alpha BETA gamma  ", "en", "books", 20)], DOCS_SCHEMA
    )
    merge_split_batch(b0, 0, state_dir)
    merge_split_batch(b1, 1, state_dir)
    rows = {r.doc_id: (r.group_id, r.split) for r in read_assignments(spark, state_dir).collect()}
    assert rows[99] == rows[1]  # group-atomic: same group, same split
    assert rows[2] != rows[1] or rows[2][0] != rows[1][0]


def test_split_replay_is_idempotent(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "web", 16), (2, "delta epsilon", "en", "web", 13)],
        DOCS_SCHEMA,
    )
    merge_split_batch(b0, 0, state_dir)
    before = sorted(tuple(r) for r in read_assignments(spark, state_dir).collect())
    merge_split_batch(b0, 0, state_dir)  # marker skip
    after = sorted(tuple(r) for r in read_assignments(spark, state_dir).collect())
    assert before == after
    groups = spark.read.parquet(os.path.join(state_dir, "groups"))
    assert groups.count() == groups.select("norm_hash").distinct().count() == 2


def test_split_compaction_preserves_state(spark, tmp_path):
    """compact_groups merges the per-batch delta files (and any exact
    replay duplicates) without changing the mapping or future routing."""
    from flink_assignment_spark.streaming.split_stream import compact_groups

    state_dir = str(tmp_path / "state")
    for b in range(4):
        batch = spark.createDataFrame(
            [(b * 10 + i, f"text body number {b * 10 + i}", "en", "web", 20) for i in range(3)],
            DOCS_SCHEMA,
        )
        merge_split_batch(batch, b, state_dir)
    before = {
        (r.norm_hash, r.group_id, r.split)
        for r in spark.read.parquet(os.path.join(state_dir, "groups")).collect()
    }
    compact_groups(spark, state_dir)
    after_df = spark.read.parquet(os.path.join(state_dir, "groups"))
    after = {(r.norm_hash, r.group_id, r.split) for r in after_df.collect()}
    assert after == before and after_df.count() == len(before)
    # routing still works against the compacted state
    b5 = spark.createDataFrame([(99, "text body number 0", "en", "web", 18)], DOCS_SCHEMA)
    merge_split_batch(b5, 4, state_dir)
    rows = {r.doc_id: (r.group_id, r.split) for r in read_assignments(spark, state_dir).collect()}
    assert rows[99] == rows[0]


def test_merge_split_batch_without_source_column(spark, tmp_path):
    """A stream lacking a `source` column still routes (source_col=None
    carries a null), and a renamed provenance column maps through
    source_col — the signature is fully generic (ADVICE round 11)."""
    from flink_assignment_spark.streaming.split_stream import (
        merge_split_batch,
        read_assignments,
    )

    no_src = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    d1 = str(tmp_path / "no_src")
    merge_split_batch(no_src, 0, d1, source_col=None)
    rows = read_assignments(spark, d1).collect()
    assert len(rows) == 2 and all(r.source is None for r in rows)

    renamed = spark.createDataFrame(
        [(1, "alpha beta", "webA")], "doc_id long, text string, origin string"
    )
    d2 = str(tmp_path / "renamed")
    merge_split_batch(renamed, 0, d2, source_col="origin")
    rows = read_assignments(spark, d2).collect()
    assert len(rows) == 1 and rows[0].source == "webA"

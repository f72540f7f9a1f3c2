"""Streaming SimHash near-dup: the accumulated verified-pair set
equals batch simhash_pairs regardless of batching, fingerprints are
batching-invariant, and the saturation valve tombstones degenerate
cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import simhash_pairs
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.simhash_stream import (
    incremental_simhash_neardup,
    merge_simhash_batch,
    read_verified_pairs,
)

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string"
N_DOCS = 150
MAX_HAMMING = 7


def test_streaming_simhash_matches_batch(spark, tmp_path):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < N_DOCS)
        .cache()
    )
    d = tmp_path / "in"
    d.mkdir()
    rows = docs.collect()
    # 4 interleaved micro-batches — near-dup group members land in
    # DIFFERENT batches, so new x old detection must fire
    for i in range(4):
        chunk = [(r.doc_id, r.text) for r in rows if r.doc_id % 4 == i]
        spark.createDataFrame(chunk, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    state = str(tmp_path / "sh")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = incremental_simhash_neardup(stream, state, max_hamming=MAX_HAMMING)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in read_verified_pairs(spark, state).collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_pairs(docs, MAX_HAMMING).collect()
    }
    assert got == want and len(want) > 0
    # cross-batch detection actually fired: some pair spans batches
    assert any(a % 4 != b % 4 for (a, b) in got)
    docs.unpersist()


def test_replay_and_saturation_valve(spark, tmp_path):
    state = str(tmp_path / "sh")
    # 5 identical docs: every block cell holds 5 members — cap at 3
    # tombstones the cells after batch 0; batch 1 members then emit
    # nothing (degenerate near-constant corpus, the valve's target)
    b0 = spark.createDataFrame(
        [(i, "same text body repeated here") for i in range(5)], DOCS_SCHEMA
    )
    merge_simhash_batch(b0, 0, state, max_state_bucket=3)
    n0 = read_verified_pairs(spark, state).count()
    assert n0 == 10  # within-batch pairs still found (5 choose 2)
    b1 = spark.createDataFrame(
        [(10 + i, "same text body repeated here") for i in range(3)], DOCS_SCHEMA
    )
    merge_simhash_batch(b1, 1, state, max_state_bucket=3)
    got = read_verified_pairs(spark, state)
    # saturated cells emit nothing new beyond batch-1's internal pairs
    assert got.filter("doc_a < 10 AND doc_b >= 10").count() == 0
    # replay is a no-op
    merge_simhash_batch(b1, 1, state, max_state_bucket=3)
    assert read_verified_pairs(spark, state).count() == got.count()

"""Streaming hard-negative miner == batch q124 on a replayed corpus;
the fold is idempotent under at-least-once redelivery and the state
table stays bounded at |anchors| x k."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_assignment_spark.operators.similarity import hard_negatives
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.hardneg_stream import (
    freeze_anchors,
    hard_negatives_stream,
    mine_negatives_batch,
    read_hard_negatives,
)

from .conftest import SF_DIR

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def test_stream_miner_matches_batch_q124(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "embeddings")
    anchors = corpus.filter(F.col("vec_id") < 20)
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in hard_negatives(anchors, corpus, k=3).collect()
    }
    assert want

    kernel = freeze_anchors(anchors, k=3)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = corpus.select("vec_id", "embedding", "label").collect()
    step = max(1, len(rows) // 7)  # several micro-batches
    for i in range(0, len(rows), step):
        spark.createDataFrame(rows[i : i + step], EMB_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i:05d}")
        )
        time.sleep(0.02)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = hard_negatives_stream(stream, state_dir, kernel, k=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    res = read_hard_negatives(spark, state_dir)
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim) for r in res.collect()
    }
    assert got == want
    assert res.count() <= 20 * 3  # bounded state


def test_miner_fold_is_idempotent(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "embeddings")
    anchors = corpus.filter(F.col("vec_id") < 5)
    kernel = freeze_anchors(anchors, k=2)
    state_dir = str(tmp_path / "state")
    b0 = corpus.filter(F.col("vec_id") < 40)
    b1 = corpus.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80))

    mine_negatives_batch(b0, 0, state_dir, kernel, k=2)
    mine_negatives_batch(b1, 1, state_dir, kernel, k=2)
    want = sorted(tuple(r) for r in read_hard_negatives(spark, state_dir).collect())

    # marker-skipped redelivery of an applied batch changes nothing
    mine_negatives_batch(b1, 1, state_dir, kernel, k=2)
    assert sorted(tuple(r) for r in read_hard_negatives(spark, state_dir).collect()) == want

    # a raced replay past the marker (simulated by a fresh state_dir
    # replaying b1 twice with distinct ids) still folds to the same
    # table — candidates are deterministic and the dedup collapses them
    d2 = str(tmp_path / "state2")
    mine_negatives_batch(b0, 0, d2, kernel, k=2)
    mine_negatives_batch(b1, 1, d2, kernel, k=2)
    mine_negatives_batch(b1, 2, d2, kernel, k=2)  # duplicate content
    assert sorted(tuple(r) for r in read_hard_negatives(spark, d2).collect()) == want


def test_sharded_anchor_stream_matches_batch(spark, tmp_path):
    """freeze_anchors with a tiny block size (forcing many broadcast
    anchor blocks — the sharded form that lifted the 65,536-anchor
    cliff) streams to exactly the single-block batch q124 answer:
    blocks partition the anchors, so the per-block emissions compose
    under the miner's fold identically."""
    emb = load_table(spark, SF_DIR, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 20)
    corpus = emb
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in hard_negatives(anchors, corpus, k=3).collect()
    }

    kernel = freeze_anchors(anchors, k=3, max_anchor_block=6)  # 4 blocks
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = corpus.select("vec_id", "embedding", "label").collect()
    for i in range(0, len(rows), 40):
        spark.createDataFrame(
            rows[i : i + 40], "vec_id long, embedding array<float>, label int"
        ).coalesce(1).write.parquet(str(in_dir / f"f{i:04d}"))
        time.sleep(0.01)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = hard_negatives_stream(stream, state_dir, kernel, k=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in read_hard_negatives(spark, state_dir).collect()
    }
    assert got == want and len(want) > 0

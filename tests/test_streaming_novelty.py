"""Streaming novelty == batch q78 under in-order replay: with one doc
per micro-batch in doc_id order, each batch's (n_shingles, n_new)
must equal q78's per-doc first-occurrence row for that doc; the seen
state must only grow, and only touched buckets are rewritten."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.novelty_stream import (
    incremental_novelty,
    read_novelty_stats,
)

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"
# 12 one-doc micro-batches ≈ 1.5 min of wall clock; parity semantics
# are independent of the count
N_DOCS = 12


def test_streaming_novelty_matches_q78_in_order(spark, tmp_path):
    subset = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .filter(F.col("doc_id") < N_DOCS)
        .orderBy("doc_id")
        .collect()
    )
    assert len(subset) == N_DOCS

    # batch oracle: q78 over a corpus containing ONLY the subset
    oracle_dir = str(tmp_path / "oracle_sf")
    spark.createDataFrame(subset, DOCS_SCHEMA).write.parquet(
        os.path.join(oracle_dir, "documents.parquet")
    )
    want = {
        r.doc_id: (r.n_shingles, r.n_new)
        for r in REGISTRY["q78_shingle_novelty"].spark(spark, oracle_dir).collect()
    }

    # stream: one file per doc, written in id order (file-source order)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, row in enumerate(subset):
        spark.createDataFrame([row], DOCS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i:03d}")
        )
        time.sleep(0.02)  # distinct mtimes keep file-source order stable
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(in_dir) + "/*")
    )
    q = incremental_novelty(stream, state_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    stats = sorted(read_novelty_stats(spark, state_dir).collect(), key=lambda r: r.batch_id)
    assert [r.n_docs for r in stats] == [1] * N_DOCS
    got = [(r.n_shingles, r.n_new) for r in stats]
    expected = [want[r["doc_id"]] for r in subset]
    assert got == expected

    # state contains exactly the union of all distinct shingles, once
    seen = spark.read.parquet(os.path.join(state_dir, "seen"))
    n_seen = seen.count()
    assert n_seen == seen.select("h").distinct().count()
    assert n_seen == sum(r.n_new for r in stats)
    # novelty is monotone-ish sanity: first batch is 100% novel
    assert stats[0].novelty_rate == 1.0

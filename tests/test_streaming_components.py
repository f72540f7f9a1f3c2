"""Incremental connected components: cross-batch cluster merges must
converge to the batch star-contraction labels, replays are no-ops,
and untouched components are never relabeled."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.components import connected_components
from flink_assignment_spark.operators.dedup import MAX_SHINGLE_DF, ngram_jaccard_pairs
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.components_stream import (
    incremental_components,
    merge_components_batch,
    read_components,
)

from .conftest import SF_DIR

PAIRS_SCHEMA = "doc_a long, doc_b long"


def _mapping(spark, state):
    return {
        r["node"]: r["component"] for r in read_components(spark, state).collect()
    }


def test_cross_batch_merge_of_two_existing_clusters(spark, tmp_path):
    """The hard case: a later edge joins two components built in an
    earlier batch — every node of BOTH must relabel to the joint min,
    while an unrelated component stays untouched."""
    state = str(tmp_path / "cc")
    b1 = spark.createDataFrame([(1, 2), (3, 4), (10, 11)], PAIRS_SCHEMA)
    merge_components_batch(b1, 0, state)
    assert _mapping(spark, state) == {1: 1, 2: 1, 3: 3, 4: 3, 10: 10, 11: 10}
    b2 = spark.createDataFrame([(2, 3)], PAIRS_SCHEMA)
    merge_components_batch(b2, 1, state)
    assert _mapping(spark, state) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # replayed batch is a no-op
    merge_components_batch(b2, 1, state)
    assert _mapping(spark, state) == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_streamed_components_match_batch_on_real_pairs(spark, tmp_path):
    """Replay the q15-style near-dup pairs of the real corpus in two
    micro-batches; the final mapping must equal batch
    connected_components over all pairs."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    pairs = ngram_jaccard_pairs(
        docs, threshold=0.3, max_doc_freq=MAX_SHINGLE_DF
    ).select("doc_a", "doc_b").cache()
    assert pairs.count() > 0
    mid = pairs.approxQuantile("doc_a", [0.5], 0.0)[0]
    d = tmp_path / "pairs"
    d.mkdir()
    pairs.filter(F.col("doc_a") <= mid).coalesce(1).write.parquet(str(d / "b0"))
    pairs.filter(F.col("doc_a") > mid).coalesce(1).write.parquet(str(d / "b1"))
    state = str(tmp_path / "cc")
    stream = (
        spark.readStream.schema(PAIRS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = incremental_components(stream, state)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _mapping(spark, state)
    want = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == want and len(want) > 0
    pairs.unpersist()

"""Streaming chunk-level dedup equals the batch chunk_occurrences
under in-order replay (doc_id ascending across micro-batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import chunk_occurrences
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.chunk_dedup_stream import chunk_dedup_stream

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, source string"


def test_chunk_dedup_stream_matches_batch(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    d = tmp_path / "docs"
    d.mkdir()
    # two micro-batches in doc_id order (the in-order replay contract)
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(str(d / "f1"))
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    q = (
        chunk_dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("chunks")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.doc_id, r.idx): (r.h, r.rn)
        for r in spark.sql("SELECT * FROM chunks").collect()
    }
    want = {
        (r.doc_id, r.idx): (r.h, r.rn) for r in chunk_occurrences(docs).collect()
    }
    assert got == want and len(want) > 0
    # cross-batch state actually fired: some batch-2 doc repeats a
    # batch-1 chunk (the synthetic corpus has near-dup groups)
    dup_late = [
        k for k, (_, rn) in got.items() if rn > 1 and k[0] > mid
    ]
    assert dup_late, "no cross-batch duplicate chunks — parity check is vacuous"

"""Streaming packing stats equal batch q66 pack_stats, including
shard streams that grow across micro-batches (cumulative offsets must
carry over so boundary/straddler positions match the batch window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.packing import pack_stats
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.packing_stream import (
    latest_pack_stats,
    pack_stats_stream,
)

from .conftest import SF_DIR

SCHEMA = "doc_id long, text string, source string"


def run_stream(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _rollup(spark, name, capacity):
    return {
        r["source"]: tuple(r)[1:]
        for r in latest_pack_stats(spark.table(name), capacity).collect()
    }


def test_streaming_packing_matches_batch_small_capacity(spark, tmp_path):
    """Tiny capacity (10 tokens) on hand-made docs so straddlers are
    frequent and boundary positions are easy to get wrong: a shard's
    offset must CONTINUE across micro-batches."""
    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(3 + (i * 7) % 9)), f"s{i % 2}")
        for i in range(40)
    ]
    d = tmp_path / "src"
    d.mkdir()
    # id-ordered halves → shard streams span both batches
    spark.createDataFrame(docs[:20], SCHEMA).coalesce(1).write.parquet(str(d / "b0"))
    spark.createDataFrame(docs[20:], SCHEMA).coalesce(1).write.parquet(str(d / "b1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    run_stream(pack_stats_stream(stream, capacity=10, n_shards=4), "packs")
    got = _rollup(spark, "packs", 10)
    want = {
        r["source"]: tuple(r)[1:]
        for r in pack_stats(
            spark.createDataFrame(docs, SCHEMA), capacity=10, n_shards=4
        ).collect()
    }
    assert got == want and len(want) == 2
    assert any(v[3] > 0 for v in want.values())  # straddlers exercised


def test_streaming_packing_matches_q66_on_real_documents(spark, tmp_path):
    """End-to-end on the driver-generated documents table with the
    q66 defaults, streamed in 3 micro-batches."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    d = tmp_path / "src"
    d.mkdir()
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    step = len(ids) // 3 + 1
    for k in range(3):
        chunk = set(ids[k * step : (k + 1) * step])
        docs.filter(F.col("doc_id").isin(chunk)).coalesce(1).write.parquet(
            str(d / f"b{k}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    run_stream(pack_stats_stream(stream), "packr")
    got = _rollup(spark, "packr", 2048)
    want = {r["source"]: tuple(r)[1:] for r in pack_stats(docs).collect()}
    assert got == want and len(want) > 0

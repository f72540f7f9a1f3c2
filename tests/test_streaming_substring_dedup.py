"""Streaming stride-1 substring dedup equals batch
substring_occurrences under in-order replay, including the
chunk-boundary-spanning duplicate the chunk stream misses."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import substring_occurrences
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.chunk_dedup_stream import (
    chunk_dedup_stream,
    substring_dedup_stream,
)

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string"


def _run(spark, df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_substring_stream_matches_batch_on_real_docs(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    d = tmp_path / "docs"
    d.mkdir()
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(str(d / "f1"))
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(str(d / "f2"))
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    _run(spark, substring_dedup_stream(stream), "subwins")
    got = {
        (r.doc_id, r.pos): (r.h, r.rn)
        for r in spark.sql("SELECT * FROM subwins").collect()
    }
    want = {
        (r.doc_id, r.pos): (r.h, r.rn)
        for r in substring_occurrences(docs).collect()
    }
    assert got == want and len(want) > 0
    assert any(rn > 1 and k[0] > mid for k, (_, rn) in got.items()), (
        "no cross-batch duplicate windows — parity check is vacuous"
    )


def test_substring_stream_catches_boundary_dup_chunk_stream_misses(spark, tmp_path):
    """The q68-vs-q88 defining case, streamed: a misaligned 24-token
    copy arriving in a LATER micro-batch."""
    a_toks = [f"a{i}" for i in range(40)]
    b_toks = [f"b{i}" for i in range(8)] + a_toks[4:28]
    d = tmp_path / "docs"
    d.mkdir()
    spark.createDataFrame([(1, " ".join(a_toks))], DOCS_SCHEMA).coalesce(
        1
    ).write.parquet(str(d / "f1"))
    spark.createDataFrame([(2, " ".join(b_toks))], DOCS_SCHEMA).coalesce(
        1
    ).write.parquet(str(d / "f2"))
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    _run(spark, substring_dedup_stream(stream), "sub_b")
    dup = [
        (r.doc_id, r.pos)
        for r in spark.sql("SELECT * FROM sub_b WHERE rn > 1").collect()
    ]
    assert sorted(dup) == [(2, p) for p in range(8, 17)]

    # chunk-aligned stream on the same replay: blind to it
    stream2 = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    _run(spark, chunk_dedup_stream(stream2), "chunk_b")
    assert spark.sql("SELECT * FROM chunk_b WHERE rn > 1").count() == 0


def test_streamed_spans_equal_batch_q104(spark, tmp_path):
    """read_dup_spans over the stream's accumulated occurrences equals
    the batch substring_spans report (q104) under in-order replay."""
    from flink_assignment_spark.operators.dedup import substring_spans
    from flink_assignment_spark.streaming.chunk_dedup_stream import read_dup_spans

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    mid = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    d = tmp_path / "docs"
    d.mkdir()
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(str(d / "f1"))
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(str(d / "f2"))
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    _run(spark, substring_dedup_stream(stream), "spanwins")
    got = {
        (r.doc_id, r.span_start, r.span_len)
        for r in read_dup_spans(spark.sql("SELECT * FROM spanwins")).collect()
    }
    want = {
        (r.doc_id, r.span_start, r.span_len)
        for r in substring_spans(docs).collect()
    }
    assert got == want and len(want) > 0

"""Both chunkers (q111 sliding windows, q112 content-defined) run
UNCHANGED on a streaming DataFrame — they are pure narrow maps (no
state, no watermark), so the identical operator function serves batch
and stream, and the outputs must match row-for-row."""

from __future__ import annotations

from flink_assignment_spark.operators.chunking import (
    content_defined_chunks,
    sliding_chunks,
)
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string"


def _batch_docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _stream_docs(spark, tmp_path):
    d = str(tmp_path / "docs")
    _batch_docs(spark).write.parquet(d)
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def _run_stream(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sliding_chunks_stream_parity(spark, tmp_path):
    batch = _rows(sliding_chunks(_batch_docs(spark)))
    _run_stream(sliding_chunks(_stream_docs(spark, tmp_path)), "sliding_chunks_s")
    stream = _rows(spark.table("sliding_chunks_s"))
    assert len(batch) > 0
    assert stream == batch


def test_content_defined_chunks_stream_parity(spark, tmp_path):
    batch = _rows(content_defined_chunks(_batch_docs(spark)))
    _run_stream(content_defined_chunks(_stream_docs(spark, tmp_path)), "cdc_chunks_s")
    stream = _rows(spark.table("cdc_chunks_s"))
    assert len(batch) > 0
    assert stream == batch


def test_cdc_boundary_resync_under_edit(spark):
    """The content-defined property itself: inserting one token early
    in a document changes ONLY the chunk it lands in — every boundary
    after the next hash-cut re-synchronizes, so the tail chunk hashes
    are identical. (A fixed-stride chunker shifts every later window —
    that is exactly what q111 vs q112 trades.)"""
    base_text = " ".join(f"tok{i * 37 % 1009}" for i in range(200))
    edited = "INSERTED " + base_text
    docs = spark.createDataFrame(
        [(0, base_text), (1, edited)], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.chunk_idx): r.chunk_hash
        for r in content_defined_chunks(docs).collect()
    }
    base_hashes = [h for (d, _), h in sorted(out.items()) if d == 0]
    edit_hashes = [h for (d, _), h in sorted(out.items()) if d == 1]
    # all chunks after the first shared suffix point are identical
    shared = set(base_hashes) & set(edit_hashes)
    assert len(shared) >= len(base_hashes) - 2, (
        f"CDC failed to re-synchronize: only {len(shared)} of "
        f"{len(base_hashes)} base chunks survive a 1-token edit"
    )
    # and the edit is visible: the two docs are not chunk-identical
    assert base_hashes != edit_hashes

"""The streamed composed pipeline yields the same per-source
(n_kept, n_tokens) as the batch q83 — the survivor-choice-invariant
parity contract (streaming keeps first arrival, batch keeps min id;
exact duplicates share token counts, so yield is identical)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.gates import shingle_hash_array
from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def _probe_hashes(spark):
    """Same probe the batch q83 builds: distinct shingle hashes of the
    NORMALIZED text of docs 0-19."""
    ntext = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return {
        r.h
        for r in _docs(spark)
        .filter(F.col("doc_id") < 20)
        .select(F.explode(shingle_hash_array(ntext)).alias("h"))
        .distinct()
        .collect()
    }


def test_pipeline_stream_yield_matches_batch_q83(spark, tmp_path):
    from flink_assignment_spark.streaming.pipeline_stream import pipeline_gate_stream

    d = str(tmp_path / "docs_pipe")
    _docs(spark).write.parquet(d)
    stream = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    out = pipeline_gate_stream(stream, _probe_hashes(spark))
    q = out.writeStream.outputMode("append").format("memory").queryName("pipe").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.source, r.n_kept, r.n_tokens)
        for r in spark.sql(
            "SELECT source, count(*) AS n_kept, CAST(sum(n_tokens) AS BIGINT) AS n_tokens "
            "FROM pipe GROUP BY source"
        ).collect()
    }
    want = {
        (r.source, r.n_kept, r.n_tokens)
        for r in REGISTRY["q83_pipeline_e2e"].spark(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_pipeline_tokenize_stream_matches_batch_apply(spark, tmp_path):
    """The streamed BPE tokenize stage emits EXACTLY the batch
    bpe_apply segmentation per row — the apply half is k frozen
    literal replaces (pure Catalyst narrow map), so the column
    deploys on the stream verbatim; only the rule-table collect must
    stay batch-side (the wrapper freezes the bpe_merges_df artifact
    before the streaming plan is built)."""
    from flink_assignment_spark.operators.bpe import bpe_apply, bpe_merges_df
    from flink_assignment_spark.streaming.pipeline_stream import (
        pipeline_tokenize_stream,
    )

    docs = _docs(spark).limit(80)
    merges_df = bpe_merges_df(docs, 4)

    d = str(tmp_path / "docs_tok")
    docs.write.parquet(d)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = pipeline_tokenize_stream(stream, merges_df)
    q = out.writeStream.outputMode("append").format("memory").queryName("tok").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.doc_id: (tuple(r.bpe_tokens), r.n_bpe_tokens)
        for r in spark.sql("SELECT * FROM tok").collect()
    }
    tk = bpe_apply(merges_df)
    want = {
        r.doc_id: (tuple(r.bpe_tokens), r.n_bpe_tokens)
        for r in docs.select(
            "doc_id", tk.alias("bpe_tokens"), F.size(tk).alias("n_bpe_tokens")
        ).collect()
    }
    assert got == want and len(want) == 80


def test_pipeline_tokenize_composes_with_gate_stage(spark, tmp_path):
    """Tokenize chains DOWNSTREAM of the gate pipeline in one
    streaming query: only gate SURVIVORS are tokenized, and the
    survivor id set equals the batch pipeline's (stream-batch join +
    two narrow stages compose without extra state)."""
    from flink_assignment_spark.operators.bpe import bpe_merges_df
    from flink_assignment_spark.streaming.pipeline_stream import (
        pipeline_gate_stream,
        pipeline_tokenize_stream,
    )

    docs = _docs(spark)
    merges_df = bpe_merges_df(docs.limit(80), 4)
    probe = _probe_hashes(spark)

    d = str(tmp_path / "docs_comp")
    docs.write.parquet(d)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 2).parquet(d)
    )
    kept = pipeline_gate_stream(stream, probe)
    toks = pipeline_tokenize_stream(
        kept.join(spark.read.parquet(d).select("doc_id", "text"), "doc_id", "inner"),
        merges_df,
    )
    q = toks.writeStream.outputMode("append").format("memory").queryName("comp").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM comp").collect()
    assert len(rows) > 0
    assert all(r.n_bpe_tokens == len(r.bpe_tokens) > 0 for r in rows)
    # one tokenized row per gate survivor — WHICH duplicate survives
    # is arrival-order-dependent, so the invariant is the count (the
    # q83 yield contract), not the id set
    n_kept = sum(
        r.n_kept
        for r in REGISTRY["q83_pipeline_e2e"].spark(spark, SF_DIR).collect()
    )
    assert len(rows) == n_kept

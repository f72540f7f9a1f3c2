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

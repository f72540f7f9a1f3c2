"""Streaming LM scoring equals the batch q73 on the training corpus,
and the exported-LM fallback handles unseen bigrams; the streamed
compression gate equals the batch q79."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_assignment_spark.operators.lm import export_lm, score_with_broadcast_lm
from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars int"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


def run_stream(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_broadcast_scorer_matches_batch_q73(spark):
    """The broadcast-artifact scorer is bit-identical to the in-job
    join form on the corpus the LM was trained on."""
    docs = _docs(spark)
    lm_map, fb, v = export_lm(docs)
    assert len(lm_map) > 0 and v > 0
    got = {tuple(r) for r in score_with_broadcast_lm(docs, lm_map, fb).collect()}
    want = {tuple(r) for r in REGISTRY["q73_lm_score"].spark(spark, SF_DIR).collect()}
    assert got == want and len(want) > 0


def test_lm_gate_stream_matches_batch(spark, tmp_path):
    from flink_assignment_spark.streaming.lm_stream import lm_score_gate_stream

    docs = _docs(spark)
    lm_map, fb, _ = export_lm(docs)
    d = str(tmp_path / "docs_lm")
    docs.write.parquet(d)
    stream = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    run_stream(lm_score_gate_stream(stream, lm_map, fb), "lmscore")
    got = {tuple(r) for r in spark.sql("SELECT * FROM lmscore").collect()}
    want = {tuple(r) for r in REGISTRY["q73_lm_score"].spark(spark, SF_DIR).collect()}
    assert got == want and len(want) > 0


def test_unseen_bigrams_use_fallback(spark):
    """A doc whose bigrams the LM has never seen scores n * ln(1/V)
    micro-nats — the weakest add-1 estimate, not a crash or a skip."""
    docs = _docs(spark)
    lm_map, fb, v = export_lm(docs)
    assert fb == round(math.log(1.0 / v) * 1e6)
    novel = spark.createDataFrame(
        [(999_999, "zzqx1 zzqx2 zzqx3")], "doc_id long, text string"
    )
    row = score_with_broadcast_lm(novel, lm_map, fb).collect()[0]
    assert (row["n_bigrams"], row["sum_lp_micro"]) == (2, 2 * fb)


def test_compression_gate_stream_matches_batch(spark, tmp_path):
    from flink_assignment_spark.streaming.gates_stream import compression_gate_stream

    d = str(tmp_path / "docs_z")
    _docs(spark).write.parquet(d)
    stream = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    run_stream(compression_gate_stream(stream), "zratio")
    got = {tuple(r) for r in spark.sql("SELECT * FROM zratio").collect()}
    want = {
        tuple(r) for r in REGISTRY["q79_compression_ratio"].spark(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0

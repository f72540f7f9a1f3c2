"""Streaming per-group top-K equals the batch sampling queries it
twins (q100 per-group budget, q93 weighted draw), including evictions
by later-arriving better-scored rows, and emits nothing when a batch
changes no selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.sampling import uniform_from_key
from flink_assignment_spark.queries.synthetic import (
    GROUP_BUDGET_K,
    REGISTRY,
    WSAMPLE_K,
)
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.topk_stream import latest_topk, topk_stream

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, lang string, n_chars long"


def _run(spark, df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def _docs_stream(spark, tmp_path, n_batches=3):
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")
    d = tmp_path / "src"
    d.mkdir()
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    step = len(ids) // n_batches + 1
    for b in range(n_batches):
        chunk = set(ids[b * step : (b + 1) * step])
        docs.filter(F.col("doc_id").isin(chunk)).coalesce(1).write.parquet(
            str(d / f"b{b}")
        )
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )


def test_streamed_group_budget_matches_q100(spark, tmp_path):
    stream = _docs_stream(spark, tmp_path)
    scored = stream.select(
        "lang",
        "doc_id",
        uniform_from_key(F.col("doc_id"), "budget").alias("u"),
    )
    _run(
        spark,
        topk_stream(scored, "lang", "doc_id", "u", GROUP_BUDGET_K, largest=False),
        "budget_topk",
    )
    got = {
        (r["lang"], r["doc_id"], r["rk"])
        for r in latest_topk(spark.table("budget_topk"), "lang").collect()
    }
    want = {
        (r["lang"], r["doc_id"], r["rk"])
        for r in REGISTRY["q100_group_budget_sample"].spark(spark, SF_DIR).collect()
    }
    assert got == want and len(want) > 0


def test_streamed_weighted_sample_matches_q93(spark, tmp_path):
    stream = _docs_stream(spark, tmp_path)
    scored = stream.filter(F.col("n_chars") > 0).select(
        F.lit("all").alias("g"),
        "doc_id",
        (
            F.log(uniform_from_key(F.col("doc_id"), "wsample")) / F.col("n_chars")
        ).alias("es_key"),
    )
    _run(
        spark,
        topk_stream(scored, "g", "doc_id", "es_key", WSAMPLE_K, largest=True),
        "wsample_topk",
    )
    got = {
        r["doc_id"] for r in latest_topk(spark.table("wsample_topk"), "g").collect()
    }
    want = {
        r["doc_id"]
        for r in REGISTRY["q93_weighted_sample"].spark(spark, SF_DIR).collect()
    }
    assert got == want and len(want) == WSAMPLE_K


def test_no_emission_when_selection_unchanged(spark, tmp_path):
    """A batch whose rows all score worse than the incumbent K emits
    nothing (no version bump) — the selection is stable, not chatty."""
    d = tmp_path / "src"
    d.mkdir()
    b0 = [(i, "g", float(i)) for i in range(5)]  # scores 0..4, K=3 → {0,1,2}
    b1 = [(10 + i, "g", 100.0 + i) for i in range(4)]  # all worse
    b2 = [(99, "g", -1.0)]  # better: evicts id 2
    schema = "doc_id long, grp string, s double"
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(d / f"b{i}")
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    _run(spark, topk_stream(stream, "grp", "doc_id", "s", 3), "stable_topk")
    emitted = spark.table("stable_topk").collect()
    versions = sorted({r["version"] for r in emitted})
    assert versions == [1, 2]  # batch b1 emitted nothing
    final = {
        (r["doc_id"], r["rk"])
        for r in latest_topk(spark.table("stable_topk"), "grp").collect()
    }
    assert final == {(99, 1), (0, 2), (1, 3)}

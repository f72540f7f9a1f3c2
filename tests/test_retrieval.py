"""BM25 retrieval: the frozen-stats scorer is bit-identical to the
batch q110 on the corpus the stats were exported from, unseen probe
terms take the df=0 maximal IDF, and the streaming twin matches the
batch form."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.retrieval import (
    BM25_PROBE_TERMS,
    bm25_scores,
    export_bm25_stats,
    score_with_frozen_bm25,
)
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


def test_frozen_scorer_matches_batch_q110(spark):
    """Bit-level parity on the training corpus: both forms evaluate
    the same Catalyst expression tree and integer-sum micro-unit
    contributions, so every (n_terms, score_micro, score) agrees."""
    docs = _docs(spark)
    stats = export_bm25_stats(docs)
    assert stats["n_docs"] > 0 and set(stats["df"]) <= set(BM25_PROBE_TERMS)
    got = {tuple(r) for r in score_with_frozen_bm25(docs, stats).collect()}
    want = {tuple(r) for r in REGISTRY["q110_bm25_probe"].spark(spark, SF_DIR).collect()}
    assert got == want and len(want) > 0


def test_scores_positive_and_rare_term_dominates(spark):
    """The Lucene IDF is non-negative, so every contribution — and
    every score — is > 0; and a doc matching ONLY the rare probe term
    outscores a doc matching ONLY a common one at equal tf and dl
    (the df term actually ranks)."""
    docs = _docs(spark)
    scored = bm25_scores(docs).collect()
    assert all(r["score_micro"] > 0 for r in scored)
    stats = export_bm25_stats(docs)
    rare = min(stats["df"], key=stats["df"].get)
    common = max(stats["df"], key=stats["df"].get)
    assert stats["df"][rare] < stats["df"][common]
    probe_docs = docs.sparkSession.createDataFrame(
        [(1, rare + " x y z"), (2, common + " x y z")], "doc_id long, text string"
    )
    by_id = {
        r["doc_id"]: r["score_micro"]
        for r in score_with_frozen_bm25(probe_docs, stats).collect()
    }
    assert by_id[1] > by_id[2]


def test_unseen_term_takes_df0_maximal_idf(spark):
    """A probe term absent from the export corpus scores with df = 0 —
    a finite, maximal IDF — and a higher score than any seen term at
    equal tf/dl (frozen-stats deployments hit this on new crawl
    vocabulary)."""
    docs = _docs(spark)
    probe = BM25_PROBE_TERMS + ("zzz_not_in_corpus",)
    stats = export_bm25_stats(docs, probe)
    assert "zzz_not_in_corpus" not in stats["df"]
    rare = min(stats["df"], key=stats["df"].get)
    probe_docs = docs.sparkSession.createDataFrame(
        [(1, "zzz_not_in_corpus a b"), (2, rare + " a b")],
        "doc_id long, text string",
    )
    by_id = {
        r["doc_id"]: r["score_micro"]
        for r in score_with_frozen_bm25(probe_docs, stats, probe).collect()
    }
    assert by_id[1] > by_id[2] > 0


def test_no_match_docs_dropped(spark):
    docs = _docs(spark)
    stats = export_bm25_stats(docs)
    none = docs.sparkSession.createDataFrame(
        [(7, "nothing matches here")], "doc_id long, text string"
    )
    assert score_with_frozen_bm25(none, stats).count() == 0


def test_bm25_stream_matches_batch(spark, tmp_path):
    from flink_assignment_spark.streaming.bm25_stream import bm25_probe_stream

    docs = _docs(spark)
    stats = export_bm25_stats(docs)
    d = str(tmp_path / "docs_bm25")
    docs.write.parquet(d)
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    run_stream(bm25_probe_stream(stream, stats), "bm25score")
    got = {tuple(r) for r in spark.sql("SELECT * FROM bm25score").collect()}
    want = {tuple(r) for r in REGISTRY["q110_bm25_probe"].spark(spark, SF_DIR).collect()}
    assert got == want and len(want) > 0

"""q79 byte-level compression-ratio oracle: DuckDB has no zlib, so the
exact check lives here — every row's compressed length and band is
recomputed with the same stdlib zlib and compared exactly."""

from __future__ import annotations

import zlib

import duckdb

from flink_assignment_spark.queries.synthetic import (
    COMPRESS_RANDOM,
    COMPRESS_REPETITIVE,
    REGISTRY,
    ZLIB_LEVEL,
)

from .conftest import SF_DIR


def _band(ratio: float) -> str:
    if ratio < COMPRESS_REPETITIVE:
        return "repetitive"
    if ratio > COMPRESS_RANDOM:
        return "random"
    return "ok"


def test_empty_and_sourceless_frames(spark):
    """Edge contract: empty AND NULL text band 'empty' with a NULL
    ratio (a NULL would otherwise make every when() condition NULL and
    silently fall through to 'ok'), and a sourceless frame works."""
    from flink_assignment_spark.operators.gates import compression_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "a a a a a a a a a a a a a a a a"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in compression_stats(df).collect()}
    assert "source" not in compression_stats(df).columns
    assert rows[1]["band"] == "empty" and rows[1]["ratio"] is None
    assert rows[2]["band"] in ("repetitive", "ok", "random")
    assert rows[3]["band"] == "empty" and rows[3]["ratio"] is None


def test_q79_matches_stdlib_zlib(spark):
    got = {
        r["doc_id"]: r
        for r in REGISTRY["q79_compression_ratio"].spark(spark, SF_DIR).collect()
    }
    docs = duckdb.connect().execute(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(docs) > 0
    for doc_id, text, source in docs:
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, ZLIB_LEVEL))
        ratio = round(comp / len(raw), 4)
        row = got[doc_id]
        assert (row["raw_bytes"], row["zlib_bytes"]) == (len(raw), comp), doc_id
        assert row["ratio"] == ratio, doc_id
        assert row["source"] == source, doc_id
        assert row["band"] == _band(ratio), doc_id


def test_bands_are_populated(spark):
    """The synthetic corpus should exercise at least the 'ok' band and
    produce a deterministic band histogram across runs."""
    df = REGISTRY["q79_compression_ratio"].spark(spark, SF_DIR)
    hist1 = {r["band"]: r["n"] for r in df.groupBy("band").count().withColumnRenamed("count", "n").collect()}
    hist2 = {r["band"]: r["n"] for r in df.groupBy("band").count().withColumnRenamed("count", "n").collect()}
    assert hist1 == hist2
    assert hist1.get("ok", 0) > 0

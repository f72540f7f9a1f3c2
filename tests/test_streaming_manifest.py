"""Incremental manifest == batch corpus_manifest under any batch
boundaries; retractions keep it equal to a rebuild-without; replays
skip atomically; uncheckpointed restarts are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.manifest import corpus_manifest, manifest_diff
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.manifest_stream import (
    merge_manifest_batch,
    read_manifest,
)

from .conftest import SF_DIR

COLS = ["doc_id", "text", "lang", "source"]
SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select(*COLS)


def _fold(spark, state, rows, n_batches=3, start=0, sign=1):
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_manifest_batch(
                spark.createDataFrame(chunk, SCHEMA),
                start + b, str(state), "doc_id", COLS, sign=sign,
            )


def test_manifest_stream_matches_batch(spark, tmp_path):
    docs = _docs(spark)
    rows = [tuple(r) for r in docs.collect()]
    state = tmp_path / "m"
    _fold(spark, state, rows, n_batches=4)
    live = read_manifest(spark, str(state))
    assert manifest_diff(live, corpus_manifest(docs, "doc_id", COLS)).count() == 0
    # arrival order is irrelevant (the fold is a sum)
    state2 = tmp_path / "m2"
    _fold(spark, state2, rows[1::2] + rows[0::2], n_batches=4)
    assert manifest_diff(
        read_manifest(spark, str(state2)), read_manifest(spark, str(state))
    ).count() == 0


def test_manifest_stream_retraction_tracks_erasure(spark, tmp_path):
    """Feeding the erasure path's purged rows as a sign=-1 batch keeps
    the live manifest equal to a from-scratch rebuild without them —
    the audit stays current THROUGH deletes."""
    docs = _docs(spark)
    rows = [tuple(r) for r in docs.collect()]
    erased = {rows[0][0], rows[7][0], rows[13][0]}
    state = tmp_path / "m"
    _fold(spark, state, rows, n_batches=2)
    gone = [r for r in rows if r[0] in erased]
    merge_manifest_batch(
        spark.createDataFrame(gone, SCHEMA), 2, str(state), "doc_id", COLS, sign=-1
    )
    want = corpus_manifest(
        docs.filter(~F.col("doc_id").isin(list(erased))), "doc_id", COLS
    )
    assert manifest_diff(read_manifest(spark, str(state)), want).count() == 0


def test_manifest_stream_replay_skips(spark, tmp_path):
    docs = _docs(spark)
    rows = [tuple(r) for r in docs.collect()]
    state = tmp_path / "m"
    _fold(spark, state, rows, n_batches=2)
    before = {(r.bucket, r.n_rows, r.digest)
              for r in read_manifest(spark, str(state)).collect()}
    # redelivery of an applied batch id: atomic meta no-op
    merge_manifest_batch(
        spark.createDataFrame(rows[:5], SCHEMA), 1, str(state), "doc_id", COLS
    )
    after = {(r.bucket, r.n_rows, r.digest)
             for r in read_manifest(spark, str(state)).collect()}
    assert after == before


def test_manifest_stream_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming.manifest_stream import incremental_manifest

    state = tmp_path / "m"
    merge_manifest_batch(
        spark.createDataFrame([(1, "a", "en", "s")], SCHEMA),
        0, str(state), "doc_id", COLS,
    )
    dummy = spark.createDataFrame([(2, "b", "en", "s")], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_manifest(dummy, str(state), "doc_id", COLS)

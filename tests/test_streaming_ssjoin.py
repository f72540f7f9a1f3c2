"""Streaming set-similarity join == batch q128 under replay; pairs
spanning batch boundaries surface; replays are idempotent; compaction
preserves the pair set; uncheckpointed restarts are refused."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import prefix_filter_jaccard_pairs
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.ssjoin_stream import (
    compact_postings,
    merge_ssjoin_batch,
    read_ssjoin_pairs,
)

from .conftest import SF_DIR

TAU = 0.5
SCHEMA = "doc_id long, text string"


def _batch_pairs(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs, TAU).collect()
    }


def _stream_pairs(spark, state_dir):
    return {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in read_ssjoin_pairs(spark, str(state_dir)).collect()
    }


def _replay(spark, state_dir, n_batches=3, shuffle=False):
    rows = [
        (r.doc_id, r.text) for r in load_table(spark, SF_DIR, "documents").collect()
    ]
    if shuffle:
        # arrival order must not matter for the PAIR SET (a pair's
        # jaccard depends only on final document contents)
        rows = rows[1::2] + rows[0::2]
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_ssjoin_batch(
                spark.createDataFrame(chunk, SCHEMA), b, str(state_dir), TAU
            )


def test_ssjoin_stream_matches_batch(spark, tmp_path):
    state = tmp_path / "ssj"
    _replay(spark, state, n_batches=3)
    want = _batch_pairs(spark)
    assert want  # the fixture corpus contains near-dup pairs
    assert _stream_pairs(spark, state) == want


def test_ssjoin_stream_order_independent(spark, tmp_path):
    state = tmp_path / "ssj"
    _replay(spark, state, n_batches=3, shuffle=True)
    assert _stream_pairs(spark, state) == _batch_pairs(spark)


def test_ssjoin_cross_batch_pair(spark, tmp_path):
    """A near-dup whose members arrive in DIFFERENT batches is found
    when the second member lands."""
    state = tmp_path / "ssj"
    b0 = [(1, "the quick brown fox jumps over the lazy dog today")]
    b1 = [(2, "the quick brown fox jumps over the lazy dog tonight")]
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(state), TAU)
    merge_ssjoin_batch(spark.createDataFrame(b1, SCHEMA), 1, str(state), TAU)
    got = _stream_pairs(spark, state)
    assert any(p[:2] == (1, 2) for p in got)
    # the jaccard equals the batch operator's on the same two docs
    both = spark.createDataFrame(b0 + b1, SCHEMA)
    want = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(both, TAU).collect()
    }
    assert got == want


def test_ssjoin_replay_idempotent(spark, tmp_path):
    state = tmp_path / "ssj"
    _replay(spark, state, n_batches=3)
    before = _stream_pairs(spark, state)
    # full redelivery of an applied batch id: marker no-op
    rows = [
        (r.doc_id, r.text)
        for r in load_table(spark, SF_DIR, "documents").limit(5).collect()
    ]
    merge_ssjoin_batch(spark.createDataFrame(rows, SCHEMA), 1, str(state), TAU)
    assert _stream_pairs(spark, state) == before


def test_ssjoin_compaction_preserves_pairs(spark, tmp_path):
    state = tmp_path / "ssj"
    _replay(spark, state, n_batches=2)
    before = _stream_pairs(spark, state)
    compact_postings(spark, str(state))
    # a new batch against the compacted index still matches old docs
    b = [(990001, "the quick brown fox jumps over the lazy dog today")]
    merge_ssjoin_batch(spark.createDataFrame(b, SCHEMA), 5, str(state), TAU)
    merge_ssjoin_batch(
        spark.createDataFrame(
            [(990002, "the quick brown fox jumps over the lazy dog today")], SCHEMA
        ),
        6,
        str(state),
        TAU,
    )
    after = _stream_pairs(spark, state)
    assert before <= after
    assert any(p[:2] == (990001, 990002) for p in after)


def test_ssjoin_uncheckpointed_restart_refused(spark, tmp_path):
    import pytest

    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.ssjoin_stream import incremental_ssjoin

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 2)
    dummy = spark.createDataFrame([(1, "a b c")], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_ssjoin(dummy, state_dir, TAU)


def test_ssjoin_crash_window_duplicate_postings_stay_exact(spark, tmp_path):
    """The postings-append → marker crash window leaves one batch's
    postings DUPLICATED on replay; the pair kernel counts join rows,
    so without the probe-side dedup a future batch's Jaccard against
    those docs would be inflated (possibly past the threshold). Kill
    the fold inside the window and assert the next batch's pairs
    equal the never-crashed outcome exactly."""
    b0 = [(1, "the quick brown fox jumps over the lazy dog today")]
    b1 = [(2, "the quick brown fox jumps over the lazy dog tonight")]

    # never-crashed reference
    ref = tmp_path / "ref"
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(ref), TAU)
    merge_ssjoin_batch(spark.createDataFrame(b1, SCHEMA), 1, str(ref), TAU)
    want = _stream_pairs(spark, ref)

    # crashed run: batch 0 applies fully, then its marker is removed
    # (simulating the crash after the postings append) and batch 0
    # redelivers — postings rows for doc 1 now exist TWICE
    state = tmp_path / "crash"
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(state), TAU)
    os.remove(os.path.join(str(state), "_applied_batch"))
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(state), TAU)
    post = spark.read.parquet(os.path.join(str(state), "postings"))
    # the duplication is real: physical rows exceed distinct (h, doc)
    assert post.count() > post.dropDuplicates(["h", "doc_id"]).count()
    merge_ssjoin_batch(spark.createDataFrame(b1, SCHEMA), 1, str(state), TAU)
    assert _stream_pairs(spark, state) == want


def test_ssjoin_crash_window_internal_pair_not_triple_counted(spark, tmp_path):
    """A replayed batch containing BOTH members of a pair, with the
    crash after the postings append: the batch's own docs are now in
    state, so without the strict cross-batch fence the pair matches
    `internal` AND `cross` in both directions — one groupBy sums all
    three, common becomes 3c, and the appended jaccard row is corrupt
    (it survives read_ssjoin_pairs' arbitrary-row dedup). Assert the
    replay reproduces the never-crashed pair set EXACTLY, jaccard
    values included."""
    b0 = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
    ]

    ref = tmp_path / "ref"
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(ref), TAU)
    want = _stream_pairs(spark, ref)
    assert any(p[:2] == (1, 2) for p in want)

    state = tmp_path / "crash"
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(state), TAU)
    os.remove(os.path.join(str(state), "_applied_batch"))
    # redelivery races the crash: postings for docs 1 and 2 are
    # already in state while batch 0 re-derives its own pairs
    merge_ssjoin_batch(spark.createDataFrame(b0, SCHEMA), 0, str(state), TAU)
    assert _stream_pairs(spark, state) == want

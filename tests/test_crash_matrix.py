"""Crash-window matrix for the detector's append-fold protocol.

Round 7 changed the detector's fold from partition swaps to delta
appends guarded by TWO markers (`_appended` after the bucket append,
`_applied_batch` after everything). Each write step is a distinct
crash window; this file kills the fold inside each one and asserts
the replay converges to the never-crashed outcome — the test shape
that caught the round-6 advisory findings, applied proactively to
every new window.

Windows, in fold order (merge_detector_batch):
  W1  after the pairs append            → replay re-appends pairs
      (distinct'd at read), state untouched
  W2  after the tombs append            → replay re-appends tomb keys
      (distinct'd at read)
  W3  after the bucket append, BEFORE `_appended`
      → the documented residual window: replay re-appends one batch's
        rows; pairs stay correct, compact_state purges the dups
  W4  after `_appended`, BEFORE the commit marker
      → replay recomputes pairs/tombs but SKIPS the bucket append
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.streaming import _detector, _state
from flink_assignment_spark.streaming.simhash_stream import (
    merge_simhash_batch,
    read_verified_pairs,
)

DOCS = "doc_id long, text string"
CAP = 3


def _docs(spark, ids, text="same text body repeated here"):
    return spark.createDataFrame([(i, text) for i in ids], DOCS)


def _pairs(spark, state):
    return {tuple(r) for r in read_verified_pairs(spark, state).collect()}


def _buckets(spark, state):
    return sorted(
        tuple(r)
        for r in spark.read.parquet(
            os.path.join(state, "buckets")
        ).collect()
    )


def _run_to_completion(spark, state, tmp_path, with_cap):
    """Reference outcome: two batches folded with no crash."""
    merge_simhash_batch(_docs(spark, range(3)), 0, state,
                        max_state_bucket=CAP if with_cap else None)
    merge_simhash_batch(_docs(spark, range(10, 13)), 1, state,
                        max_state_bucket=CAP if with_cap else None)
    return _pairs(spark, state), _buckets(spark, state)


@pytest.mark.parametrize("crash_after_appends,with_cap", [
    (1, False),  # W1: pairs appended, bucket append never ran
    (2, True),   # W2: pairs + tombs appended (cap makes batch 1 cross)
    (2, False),  # W3: pairs + buckets appended, _appended not yet set
])
def test_crash_after_nth_append_converges(
    spark, tmp_path, monkeypatch, crash_after_appends, with_cap
):
    want_pairs, want_buckets = _run_to_completion(
        spark, str(tmp_path / "ref"), tmp_path, with_cap
    )

    state = str(tmp_path / "st")
    cap = CAP if with_cap else None
    merge_simhash_batch(_docs(spark, range(3)), 0, state, max_state_bucket=cap)

    calls = {"n": 0}
    real_append = _state.ParquetStateBackend.append

    def crashing_append(self, out, table, part_col):
        real_append(self, out, table, part_col)
        calls["n"] += 1
        if calls["n"] == crash_after_appends:
            raise RuntimeError("simulated crash after append")

    monkeypatch.setattr(_state.ParquetStateBackend, "append", crashing_append)
    with pytest.raises(RuntimeError):
        merge_simhash_batch(_docs(spark, range(10, 13)), 1, state,
                            max_state_bucket=cap)
    monkeypatch.setattr(_state.ParquetStateBackend, "append", real_append)

    merge_simhash_batch(_docs(spark, range(10, 13)), 1, state,
                        max_state_bucket=cap)  # redelivery
    assert _pairs(spark, state) == want_pairs
    if crash_after_appends == 2 and not with_cap:
        # W3: the one window that may duplicate state rows — pairs are
        # already right; compaction restores byte-equality
        _detector.compact_state(spark, state, ["blk", "val"], "fp")
    assert _buckets(spark, state) == want_buckets


def test_crash_between_appended_mark_and_marker(spark, tmp_path, monkeypatch):
    """W4: `_appended` set, commit marker missing → the replay must
    NOT re-append the bucket delta (no duplicate state), while pairs
    re-append harmlessly."""
    want_pairs, want_buckets = _run_to_completion(
        spark, str(tmp_path / "ref"), tmp_path, False
    )
    state = str(tmp_path / "st")
    merge_simhash_batch(_docs(spark, range(3)), 0, state)

    real_commit = _detector.commit_marker

    def no_commit(state_dir, batch_id):
        raise RuntimeError("simulated crash before marker")

    monkeypatch.setattr(_detector, "commit_marker", no_commit)
    with pytest.raises(RuntimeError):
        merge_simhash_batch(_docs(spark, range(10, 13)), 1, state)
    monkeypatch.setattr(_detector, "commit_marker", real_commit)
    assert _detector._appended_batch(state) == 1  # the mark landed

    merge_simhash_batch(_docs(spark, range(10, 13)), 1, state)  # redelivery
    assert _pairs(spark, state) == want_pairs
    assert _buckets(spark, state) == want_buckets  # no dup rows, no compaction needed

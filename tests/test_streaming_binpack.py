"""Online bin packing (q146's streaming twin): budget ceiling,
exactly-once assignment, the first-fit half-empty invariant, open-bin
reuse across batches, crash-window convergence, restart refusal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.packing import SHARD_SHIFT, bin_shard
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.binpack_stream import (
    merge_binpack_batch,
    read_assignments,
)

from .conftest import SF_DIR

BUDGET = 64
SCHEMA = "doc_id long, text string"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _assign(spark, state):
    return {
        (r.doc_id, r.n_tokens, r.bin_id, r.overflow)
        for r in read_assignments(spark, str(state)).collect()
    }


def test_binpack_stream_invariants(spark, tmp_path):
    docs = _docs(spark)
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    state = tmp_path / "bp"
    per = (len(rows) + 2) // 3
    for b in range(3):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_binpack_batch(
                spark.createDataFrame(chunk, SCHEMA), b, str(state), BUDGET
            )
    got = read_assignments(spark, str(state))
    # exactly-once: every doc assigned once
    assert got.count() == len(rows)
    assert got.select("doc_id").distinct().count() == len(rows)
    per_bin = got.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("n"),
        F.max(F.col("overflow").cast("int")).alias("over"),
        F.count("*").alias("docs"),
    )
    # ceiling: no non-overflow bin exceeds the budget
    assert per_bin.filter((F.col("over") == 0) & (F.col("n") > BUDGET)).count() == 0
    # overflow bins are oversized singletons
    assert per_bin.filter((F.col("over") == 1) & (F.col("docs") != 1)).count() == 0
    assert per_bin.filter((F.col("over") == 1) & (F.col("n") <= BUDGET)).count() == 0
    # first-fit invariant survives the incremental fold: at most one
    # <=-half-full bin per shard
    half = (
        per_bin.filter(F.col("over") == 0)
        .withColumn("shard", bin_shard(F.col("bin_id")).cast("int"))
        .filter(F.col("n") * 2 <= BUDGET)
        .groupBy("shard")
        .count()
    )
    assert half.filter(F.col("count") > 1).count() == 0


def test_binpack_stream_reuses_open_bins(spark, tmp_path):
    """A later batch's small doc lands in an EARLIER batch's open bin
    — the open-bin state is what makes the stream a packer instead of
    a per-batch one."""
    state = tmp_path / "bp"
    big = " ".join(["w"] * 40)   # 40 tokens
    small = " ".join(["w"] * 10)  # 10 tokens
    merge_binpack_batch(
        spark.createDataFrame([(1, big)], SCHEMA), 0, str(state), BUDGET,
    )
    merge_binpack_batch(
        spark.createDataFrame([(2, small)], SCHEMA), 1, str(state), BUDGET,
    )
    got = _assign(spark, state)
    bins = {d: b for d, _, b, _ in got}
    # same shard guaranteed only if the ids hash together — instead
    # assert capacity accounting: if they share a shard they share a
    # bin (40+10 <= 64); if not, each shard has one bin
    if bins[1] >> SHARD_SHIFT == bins[2] >> SHARD_SHIFT:
        assert bins[1] == bins[2]
    else:
        assert len(set(bins.values())) == 2


def test_binpack_crash_window_converges(spark, tmp_path):
    """Replay after a completed fold (marker lost): every shard drops
    the already-assigned docs at the strictly-new fence and rewrites
    itself unchanged — assignments and capacities equal the
    never-crashed run."""
    rows = [(r.doc_id, r.text) for r in _docs(spark).limit(60).collect()]
    half = len(rows) // 2
    ref = tmp_path / "ref"
    for b, chunk in enumerate((rows[:half], rows[half:])):
        merge_binpack_batch(spark.createDataFrame(chunk, SCHEMA), b, str(ref), BUDGET)

    state = tmp_path / "crash"
    merge_binpack_batch(spark.createDataFrame(rows[:half], SCHEMA), 0, str(state), BUDGET)
    os.remove(os.path.join(str(state), "_applied_batch"))
    merge_binpack_batch(spark.createDataFrame(rows[:half], SCHEMA), 0, str(state), BUDGET)
    merge_binpack_batch(spark.createDataFrame(rows[half:], SCHEMA), 1, str(state), BUDGET)
    assert _assign(spark, state) == _assign(spark, ref)


def test_binpack_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.binpack_stream import incremental_binpack

    state_dir = str(tmp_path / "state")
    commit_marker(state_dir, 1)
    dummy = spark.createDataFrame([(1, "a b c")], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_binpack(dummy, state_dir, BUDGET)

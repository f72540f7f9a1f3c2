"""Incremental PageRank == batch kernel over the ingested prefix
under any batching/order; new edges shift the served ranks; crash
replays converge; uncheckpointed restarts are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.graph import weighted_pagerank
from flink_assignment_spark.streaming.pagerank_stream import (
    merge_edges_batch,
    read_pagerank,
)

SCHEMA = "eid long, src int, dst int"


def _occurrences():
    """Edge occurrences over 5 nodes with repeats (weights emerge
    from multiplicity)."""
    edges = [(0, 1), (0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 4), (4, 3), (1, 0)]
    return [(i, s, d) for i, (s, d) in enumerate(edges)]


def _ranks(spark, state):
    return {r.node: r.rank for r in read_pagerank(spark, str(state)).collect()}


def _batch_ranks(spark, occ):
    edges = (
        spark.createDataFrame(occ, SCHEMA)
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("weight"))
    )
    return {r.node: r.rank for r in weighted_pagerank(edges).collect()}


def test_pagerank_stream_matches_batch_any_order(spark, tmp_path):
    occ = _occurrences()
    want = _batch_ranks(spark, occ)
    for shuffle in (False, True):
        rows = occ[1::2] + occ[0::2] if shuffle else occ
        state = tmp_path / f"pr{int(shuffle)}"
        per = 3
        for b in range((len(rows) + per - 1) // per):
            merge_edges_batch(
                spark.createDataFrame(rows[b * per : (b + 1) * per], SCHEMA),
                b, str(state), "eid",
            )
        assert _ranks(spark, state) == want


def test_pagerank_stream_ranks_shift_with_new_edges(spark, tmp_path):
    """The served ranks are live: after new occurrences point at node
    2, its rank strictly rises — and the served table equals the
    batch kernel over the extended prefix."""
    occ = _occurrences()
    state = tmp_path / "pr"
    merge_edges_batch(spark.createDataFrame(occ, SCHEMA), 0, str(state), "eid")
    before = _ranks(spark, state)
    extra = [(100 + i, s, 2) for i, s in enumerate((0, 1, 3, 4))]
    merge_edges_batch(spark.createDataFrame(extra, SCHEMA), 1, str(state), "eid")
    after = _ranks(spark, state)
    assert after[2] > before[2]
    assert after == _batch_ranks(spark, occ + extra)


def test_pagerank_stream_crash_replay_converges(spark, tmp_path):
    occ = _occurrences()
    state = tmp_path / "pr"
    merge_edges_batch(spark.createDataFrame(occ[:5], SCHEMA), 0, str(state), "eid")
    merge_edges_batch(spark.createDataFrame(occ[5:], SCHEMA), 1, str(state), "eid")
    want = _ranks(spark, state)
    os.remove(os.path.join(str(state), "_applied_batch"))
    merge_edges_batch(spark.createDataFrame(occ[5:], SCHEMA), 1, str(state), "eid")
    assert _ranks(spark, state) == want
    assert want == _batch_ranks(spark, occ)


def test_pagerank_stream_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.pagerank_stream import (
        incremental_pagerank,
    )

    state = str(tmp_path / "pr")
    os.makedirs(state, exist_ok=True)
    commit_marker(state, 1)
    dummy = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_pagerank(dummy, state, "value", "value", "value")

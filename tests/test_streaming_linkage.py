"""Streaming fuzzy linkage == batch q125 under replay; cross-batch
pairs surface; replays are idempotent; compaction preserves matches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from flink_assignment_spark.operators.linkage import fuzzy_pairs_lev1
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.linkage_stream import (
    compact_variants,
    merge_linkage_batch,
    read_pairs,
)

from .conftest import SF_DIR

SCHEMA = "rid long, name string"


def _batch_pairs(spark):
    cust = load_table(spark, SF_DIR, "customer")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs_lev1(cust, "c_custkey", "c_name").collect()
    }


def _stream_pairs(spark, state_dir):
    return {
        (r.id_a, r.id_b, r.dist)
        for r in read_pairs(spark, str(state_dir)).collect()
    }


def _replay(spark, state_dir, n_batches=3, shuffle=False):
    rows = [
        (r.c_custkey, r.c_name)
        for r in load_table(spark, SF_DIR, "customer").collect()
    ]
    if shuffle:
        # arrival order must not matter for the PAIR SET (unlike the
        # time-ordered streams, linkage has no in-order contract)
        rows = rows[1::2] + rows[0::2]
    per = (len(rows) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_linkage_batch(
                spark.createDataFrame(chunk, SCHEMA), b, str(state_dir)
            )


def test_linkage_stream_matches_batch(spark, tmp_path):
    state = tmp_path / "lk"
    _replay(spark, state, n_batches=3)
    assert _stream_pairs(spark, state) == _batch_pairs(spark)


def test_linkage_stream_order_independent(spark, tmp_path):
    state = tmp_path / "lk"
    _replay(spark, state, n_batches=4, shuffle=True)
    assert _stream_pairs(spark, state) == _batch_pairs(spark)


def test_linkage_cross_batch_pair(spark, tmp_path):
    state = tmp_path / "lk"
    b0 = spark.createDataFrame([(10, "gamma"), (11, "delta")], SCHEMA)
    b1 = spark.createDataFrame([(12, "gamna"), (13, "omega")], SCHEMA)
    merge_linkage_batch(b0, 0, str(state))
    merge_linkage_batch(b1, 1, str(state))
    got = _stream_pairs(spark, state)
    assert got == {(10, 12, 1)}  # gamma ~ gamna across batches


def test_linkage_replay_idempotent(spark, tmp_path):
    state = tmp_path / "lk"
    _replay(spark, state, n_batches=2)
    before = _stream_pairs(spark, state)
    rows = [
        (r.c_custkey, r.c_name)
        for r in load_table(spark, SF_DIR, "customer").limit(20).collect()
    ]
    # stale batch id — marker skip
    merge_linkage_batch(spark.createDataFrame(rows, SCHEMA), 0, str(state))
    assert _stream_pairs(spark, state) == before
    # lost-marker replay: re-derives exact duplicates only
    os.remove(os.path.join(str(state), "_applied_batch"))
    all_rows = [
        (r.c_custkey, r.c_name)
        for r in load_table(spark, SF_DIR, "customer").collect()
    ]
    per = (len(all_rows) + 1) // 2
    merge_linkage_batch(
        spark.createDataFrame(all_rows[per:], SCHEMA), 1, str(state)
    )
    assert _stream_pairs(spark, state) == before


def test_linkage_compaction_preserves_pairs(spark, tmp_path):
    state = tmp_path / "lk"
    _replay(spark, state, n_batches=3)
    before = _stream_pairs(spark, state)
    compact_variants(spark, str(state))
    # new arrivals still match against the compacted index
    nxt = spark.createDataFrame([(990001, "Customer#000000001")], SCHEMA)
    merge_linkage_batch(nxt, 3, str(state))
    after = _stream_pairs(spark, state)
    assert before < after
    assert (1, 990001, 0) in after  # exact-name match against old record


def test_linkage_uncheckpointed_restart_refused(spark, tmp_path):
    """The variant-index fold is convergent but not reprocessable: an
    uncheckpointed restart over marked state must be refused at
    construction (the r13-ADVICE silent-data-loss class)."""
    import pytest

    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.linkage_stream import incremental_linkage

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)
    commit_marker(state_dir, 2)
    dummy = spark.createDataFrame([(1, "a")], SCHEMA)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_linkage(dummy, state_dir)


def test_linkage_stream_k2_matches_batch_and_pins_max_dist(spark, tmp_path):
    """max_dist=2 streaming linkage equals batch fuzzy_pairs(k=2) on
    the same corpus (arrival-split), and the pinned parameter refuses
    a mid-stream change (the index is only complete for its k)."""
    import pytest

    from flink_assignment_spark.operators.linkage import fuzzy_pairs

    rows = [
        (0, "alpha"), (1, "alpxb"), (2, "alp"), (3, "beta"),
        (4, "betxx"), (5, "gamma"), (6, "gxmma"), (7, "ab"), (8, "ba"),
    ]
    df = spark.createDataFrame(rows, "rid long, name string")
    want = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "rid", "name", max_dist=2).collect()
    }
    assert any(p[2] == 2 for p in want)  # distance-2 pairs exist

    state = tmp_path / "lk2"
    half = len(rows) // 2
    for b, chunk in enumerate((rows[:half], rows[half:])):
        merge_linkage_batch(
            spark.createDataFrame(chunk, "rid long, name string"),
            b, str(state), max_dist=2,
        )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in read_pairs(spark, str(state)).collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="max_dist=2"):
        merge_linkage_batch(
            spark.createDataFrame(rows[:1], "rid long, name string"),
            5, str(state), max_dist=1,
        )

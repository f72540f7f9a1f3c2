"""Streaming generalize-then-release gate: single-batch == batch
k_generalize row-for-row; released table is ALWAYS k-anonymous on
(gen_level, generalized tuple); exactly-once release; coarser-level
release under cross-batch starvation (documented divergence from
batch); crash-window convergence; restart refusal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.privacy import k_generalize
from flink_assignment_spark.streaming.generalize_stream import (
    merge_generalize_batch,
    read_pending,
    read_released,
)

K = 2
QUASI = ["band"]
SCHEMA = "rid long, band long, v long"


def _levels():
    # nested hierarchy: band → band//2 → whole range
    return [
        {},
        {"band": (F.floor(F.col("v") / 2)).cast("long")},
        {"band": F.lit(0).cast("long")},
    ]


def _rows_from_vals(vals, start_rid=0):
    return [(start_rid + i, v, v) for i, v in enumerate(vals)]


def _released_set(spark, state):
    return {
        (r.rid, r.gen_level) for r in read_released(spark, str(state), "rid").collect()
    }


def test_single_batch_equals_batch_k_generalize(spark, tmp_path):
    """One batch through the gate == the batch operator exactly
    (same level walk over the same candidate set)."""
    vals = [0, 0, 1, 2, 3, 3, 7, 9]
    rows = _rows_from_vals(vals)
    state = tmp_path / "gen"
    merge_generalize_batch(
        spark.createDataFrame(rows, SCHEMA), 0, str(state), QUASI, _levels(), K, "rid"
    )
    got = _released_set(spark, state)
    want = {
        (r.rid, r.gen_level)
        for r in k_generalize(
            spark.createDataFrame(rows, SCHEMA), QUASI, _levels(), K
        ).collect()
    }
    assert got == want
    # pending holds exactly the batch-suppressed residue
    pend = read_pending(spark, str(state))
    sup = {r[0] for r in rows} - {r for r, _ in want}
    assert {r.rid for r in pend.collect()} == sup if sup else pend is None


def test_released_always_k_anonymous_and_exactly_once(spark, tmp_path):
    """Invariant under ANY batching: every (gen_level, generalized
    tuple) cohort of the released table has >= k members, and each
    record releases exactly once."""
    import random

    rng = random.Random(3)
    vals = [rng.randrange(8) for _ in range(60)]
    rows = _rows_from_vals(vals)
    state = tmp_path / "gen"
    per = 7
    for b in range((len(rows) + per - 1) // per):
        chunk = rows[b * per : (b + 1) * per]
        merge_generalize_batch(
            spark.createDataFrame(chunk, SCHEMA), b, str(state), QUASI, _levels(),
            K, "rid",
        )
    rel = read_released(spark, str(state), "rid")
    assert rel.count() == rel.select("rid").distinct().count()
    # regeneralize each released row at ITS level; every cohort >= k
    levels = _levels()
    width_band = (
        F.when(F.col("gen_level") == 0, F.col("v"))
        .when(F.col("gen_level") == 1, F.floor(F.col("v") / 2))
        .otherwise(F.lit(0))
    )
    cohorts = rel.groupBy("gen_level", width_band.alias("g")).count()
    assert cohorts.filter(F.col("count") < K).count() == 0
    # released + pending partition the input
    pend = read_pending(spark, str(state))
    n_pend = 0 if pend is None else pend.count()
    assert rel.count() + n_pend == len(rows)


def test_cross_batch_coarse_release_and_open_group_passthrough(spark, tmp_path):
    """Two singletons in different fine bands but one coarse band,
    arriving in separate batches: the second arrival opens the COARSE
    group and flushes both (batch over the union would release at the
    fine level only with k members — here neither fine band ever gets
    2). A third arrival of the now-open coarse group releases
    immediately."""
    state = tmp_path / "gen"
    merge_generalize_batch(
        spark.createDataFrame([(1, 0, 0)], SCHEMA), 0, str(state), QUASI,
        _levels(), K, "rid",
    )
    assert read_pending(spark, str(state)).count() == 1
    merge_generalize_batch(
        spark.createDataFrame([(2, 1, 1)], SCHEMA), 1, str(state), QUASI,
        _levels(), K, "rid",
    )
    assert _released_set(spark, state) == {(1, 1), (2, 1)}  # coarse level 1
    pend = read_pending(spark, str(state))
    assert pend is None or pend.count() == 0
    # open-group passthrough: a new lone member of the open coarse
    # group releases at once, at the open level
    merge_generalize_batch(
        spark.createDataFrame([(3, 0, 0)], SCHEMA), 2, str(state), QUASI,
        _levels(), K, "rid",
    )
    assert (3, 1) in _released_set(spark, state)


def test_stream_can_release_coarser_than_batch(spark, tmp_path):
    """The documented order divergence: fine-group members split
    across batches release coarse (the union batch would release them
    fine) — k-anonymity still holds, the LEVEL differs."""
    rows = [(1, 0, 0), (2, 2, 2), (3, 0, 0), (4, 2, 2)]
    # batch over all four: two fine groups of 2 → all release level 0
    want_batch = {
        (r.rid, r.gen_level)
        for r in k_generalize(
            spark.createDataFrame(rows, SCHEMA), QUASI, _levels(), K
        ).collect()
    }
    assert want_batch == {(1, 0), (2, 0), (3, 0), (4, 0)}
    state = tmp_path / "gen"
    # arrival order: one member of each fine group first → they open
    # the shared... no: bands 0 and 2 differ at level 1 too (0//2=0,
    # 2//2=1) — use level 2 (whole range) as the coarse open
    merge_generalize_batch(
        spark.createDataFrame(rows[:2], SCHEMA), 0, str(state), QUASI,
        _levels(), K, "rid",
    )
    got01 = _released_set(spark, state)
    assert got01 == {(1, 2), (2, 2)}  # released at the root level
    merge_generalize_batch(
        spark.createDataFrame(rows[2:], SCHEMA), 1, str(state), QUASI,
        _levels(), K, "rid",
    )
    got = _released_set(spark, state)
    # late fine-group members release at the already-open root too
    assert got == {(1, 2), (2, 2), (3, 2), (4, 2)}
    # every cohort still >= k: all four share the root group
    assert len(got) == 4


def test_generalize_crash_window_converges(spark, tmp_path):
    """Marker lost after a completed fold: replay converges (released
    dedups by id, open dedups at read, pending purge re-runs)."""
    rows = [(1, 0, 0), (2, 0, 0), (3, 5, 5)]
    ref = tmp_path / "ref"
    merge_generalize_batch(
        spark.createDataFrame(rows, SCHEMA), 0, str(ref), QUASI, _levels(), K, "rid"
    )
    want = _released_set(spark, ref)

    crash = tmp_path / "crash"
    merge_generalize_batch(
        spark.createDataFrame(rows, SCHEMA), 0, str(crash), QUASI, _levels(), K, "rid"
    )
    os.remove(os.path.join(str(crash), "_applied_batch"))
    merge_generalize_batch(
        spark.createDataFrame(rows, SCHEMA), 0, str(crash), QUASI, _levels(), K, "rid"
    )
    assert _released_set(spark, crash) == want
    p_ref = read_pending(spark, str(ref))
    p_crash = read_pending(spark, str(crash))
    assert {r.rid for r in p_ref.collect()} == {r.rid for r in p_crash.collect()}


def test_generalize_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.generalize_stream import (
        incremental_generalize,
    )

    state = str(tmp_path / "gen")
    os.makedirs(state, exist_ok=True)
    commit_marker(state, 1)
    dummy = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_generalize(dummy, state, QUASI, _levels(), K, "rid")

"""Streaming t-closeness monitor == batch q154 audit under any
batching; verdicts flip BOTH ways as data accumulates (t-closeness is
non-monotone — the reason this is a monitor, not an open-once gate);
crash-window replays converge; uncheckpointed restarts are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.privacy import t_closeness_audit
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.tcloseness_stream import (
    merge_tcloseness_batch,
    read_tcloseness,
)

from .conftest import SF_DIR

QUASI = ["c_nationkey", "c_mktsegment"]


def _sens():
    return F.floor(F.col("c_acctbal") / 1000).cast("long")


def _audit_set(df):
    return {tuple(r) for r in df.drop("t_emd").collect()}


def test_tcloseness_stream_matches_batch_audit(spark, tmp_path):
    cust = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    want = _audit_set(t_closeness_audit(cust, QUASI, _sens()))
    rows = [tuple(r) for r in cust.collect()]
    schema = "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double"
    state = tmp_path / "tc"
    per = (len(rows) + 2) // 3
    for b in range(3):
        chunk = rows[b * per : (b + 1) * per]
        if chunk:
            merge_tcloseness_batch(
                spark.createDataFrame(chunk, schema), b, str(state),
                "c_custkey", QUASI, _sens(),
            )
    got = _audit_set(read_tcloseness(spark, str(state), QUASI))
    assert got == want


def test_tcloseness_verdict_flips_both_ways(spark, tmp_path):
    """Group g starts matching the global distribution (pass), drifts
    to concentrated (fail) as skewed members arrive, then recovers
    (pass) — monotone gates cannot express this; the derived monitor
    must."""
    schema = "rid long, grp string, v long"
    state = tmp_path / "tc"

    def verdict():
        return {
            r.grp: r.t_ok
            for r in read_tcloseness(
                spark, str(state), ["grp"], t_frac=(1, 4)
            ).collect()
        }

    # a large stable background group h pins the global distribution
    # (without it the global chases g's drift and the EMD stays small)
    # batch 0: h = 10×v0 + 10×v1, g = {0, 1} → both EMD 0, pass
    b0 = [(i, "h", i % 2) for i in range(20)] + [(100, "g", 0), (101, "g", 1)]
    merge_tcloseness_batch(
        spark.createDataFrame(b0, schema), 0, str(state), "rid", ["grp"], F.col("v")
    )
    assert verdict() == {"g": 1, "h": 1}
    # batch 1: six more g-members all at v=0 → g = (7,1)/8 vs global
    # (17,11)/28 → EMD = 15/56 ≈ 0.268 > 1/4 → fails
    b1 = [(102 + i, "g", 0) for i in range(6)]
    merge_tcloseness_batch(
        spark.createDataFrame(b1, schema), 1, str(state), "rid", ["grp"], F.col("v")
    )
    assert verdict()["g"] == 0
    # batch 2: six g-members at v=1 rebalance → g = (7,7), global
    # (17,17) → EMD 0 → passes again
    b2 = [(200 + i, "g", 1) for i in range(6)]
    merge_tcloseness_batch(
        spark.createDataFrame(b2, schema), 2, str(state), "rid", ["grp"], F.col("v")
    )
    assert verdict()["g"] == 1


def test_tcloseness_crash_window_converges(spark, tmp_path):
    schema = "rid long, grp string, v long"
    rows = [(i, "g" if i % 3 else "h", i % 4) for i in range(24)]
    ref = tmp_path / "ref"
    crash = tmp_path / "crash"
    for state in (ref, crash):
        merge_tcloseness_batch(
            spark.createDataFrame(rows[:12], schema), 0, str(state), "rid",
            ["grp"], F.col("v"),
        )
        merge_tcloseness_batch(
            spark.createDataFrame(rows[12:], schema), 1, str(state), "rid",
            ["grp"], F.col("v"),
        )
    os.remove(os.path.join(str(crash), "_applied_batch"))
    merge_tcloseness_batch(
        spark.createDataFrame(rows[12:], schema), 1, str(crash), "rid",
        ["grp"], F.col("v"),
    )
    assert _audit_set(read_tcloseness(spark, str(crash), ["grp"])) == _audit_set(
        read_tcloseness(spark, str(ref), ["grp"])
    )


def test_tcloseness_uncheckpointed_restart_refused(spark, tmp_path):
    from flink_assignment_spark.streaming._state import commit_marker
    from flink_assignment_spark.streaming.tcloseness_stream import (
        incremental_tcloseness,
    )

    state = str(tmp_path / "tc")
    os.makedirs(state, exist_ok=True)
    commit_marker(state, 1)
    dummy = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_tcloseness(dummy, state, "value", ["value"], F.col("value"))

"""Streaming Misra-Gries heavy hitters: the superset guarantee vs
batch q92's exact set, count-bound validity, and replay idempotency."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flink_assignment_spark.operators.frequent import heavy_hitters
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.frequent_stream import (
    incremental_heavy_hitters,
    merge_frequent_batch,
    read_heavy_hitters,
)

from .conftest import SF_DIR

PHI_INV = 50


def test_streamed_mg_supersets_exact_and_bounds_hold(spark, tmp_path):
    """Replay the real documents table in 4 micro-batches: the
    streamed report must contain every exact heavy hitter, and every
    tracked counter must bracket the true count within dec_total."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    d = tmp_path / "src"
    d.mkdir()
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    step = len(ids) // 4 + 1
    for k in range(4):
        chunk = set(ids[k * step : (k + 1) * step])
        docs.filter(F.col("doc_id").isin(chunk)).coalesce(1).write.parquet(
            str(d / f"b{k}")
        )
    state = str(tmp_path / "state")
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d) + "/*")
    q = incremental_heavy_hitters(stream, state, phi_inv=PHI_INV)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    report = read_heavy_hitters(state, PHI_INV)
    streamed = {e["token"] for e in report}
    exact = {
        r["token"]: r["cnt"] for r in heavy_hitters(docs, phi_inv=PHI_INV).collect()
    }
    assert set(exact) <= streamed and len(exact) > 0  # superset rule

    true_counts = Counter()
    for r in docs.collect():
        true_counts.update(r["text"].split())
    bounds = {e["token"]: (e["lower"], e["upper"]) for e in report}
    for tok, (lo, hi) in bounds.items():
        assert lo <= true_counts[tok] <= hi, (tok, lo, true_counts[tok], hi)


def test_partition_decrements_tracked_in_bounds(spark):
    """Adversarial shape for the bound bookkeeping: phi_inv=3 with a
    flood of near-unique fillers forces every partition's MG kernel to
    decrement the genuinely-frequent token. Those partition-local
    decrements are invisible in the merged counters, so unless the
    kernel surfaces them into dec_total the reported upper bound falls
    BELOW the true count (the round-6 advisory bug: with the old
    driver-only dec_total this corpus yields upper(hh) < freq(hh))."""
    import tempfile

    from flink_assignment_spark.streaming.frequent_stream import _load

    docs = []
    for i in range(120):
        toks = [f"x{i}a{j}" for j in range(8)]
        if i % 3 == 0:
            toks.append("hh")
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    true_counts = Counter(t for _, text in docs for t in text.split())
    with tempfile.TemporaryDirectory() as state:
        merge_frequent_batch(df, 0, state, phi_inv=3)
        st = _load(state)
        assert st["dec_total"] > 0  # decrements actually fired
        for tok, c in st["counters"].items():
            assert c <= true_counts[tok] <= c + st["dec_total"], (
                tok,
                c,
                true_counts[tok],
                st["dec_total"],
            )
        # the heavy token is tracked and its bracket contains 40
        assert "hh" in st["counters"]


def test_replayed_batch_is_noop(spark):
    import tempfile

    docs = spark.createDataFrame(
        [(i, "alpha beta " + f"u{i}") for i in range(30)], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as state:
        merge_frequent_batch(docs, 0, state, phi_inv=10)
        r1 = read_heavy_hitters(state, 10)
        merge_frequent_batch(docs, 0, state, phi_inv=10)  # redelivery
        assert read_heavy_hitters(state, 10) == r1
        # alpha/beta appear 30x of N=90 — far over N/10, both reported
        assert {e["token"] for e in r1} >= {"alpha", "beta"}

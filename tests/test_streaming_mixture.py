"""Streaming mixture rebalance vs batch q67: a single-batch replay
reproduces the batch kept set exactly; a multi-batch replay's final
counts/rates equal the batch ones exactly, its final batch is gated
with the exact batch rates, and the achieved mixture converges to
batch q67's shares."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.sampling import mixture_rates, uniform_from_key
from flink_assignment_spark.queries.synthetic import MIX_WEIGHTS
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.mixture_stream import (
    incremental_mixture_rebalance,
    merge_mixture_batch,
    read_kept_mixture,
    read_mixture_counts,
)

from .conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "lang")


def _batch_kept(spark):
    docs = _docs(spark)
    rates = mixture_rates(docs, "lang", MIX_WEIGHTS)
    return docs.join(F.broadcast(rates), "lang").filter(
        uniform_from_key(F.col("doc_id"), "mix") < F.col("keep_rate")
    )


def _run_stream(spark, src_dir, state_dir, files_per_trigger=None):
    reader = spark.readStream.schema("doc_id long, lang string")
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(src_dir + "/*")
    q = incremental_mixture_rebalance(stream, state_dir, MIX_WEIGHTS)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_single_batch_replay_is_exactly_batch_q67(spark, tmp_path):
    d = str(tmp_path / "src")
    _docs(spark).coalesce(1).write.parquet(d + "/all")
    state = str(tmp_path / "state")
    _run_stream(spark, d, state)
    got = {tuple(r) for r in read_kept_mixture(spark, state).collect()}
    want = {tuple(r) for r in _batch_kept(spark).select("doc_id", "lang").collect()}
    assert got == want and len(want) > 0


def test_multi_batch_counts_rates_and_convergence(spark, tmp_path):
    docs = _docs(spark)
    d = tmp_path / "src"
    d.mkdir()
    # 5 ordered id-range batches (a growing crawl)
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    step = len(ids) // 5 + 1
    for k in range(5):
        chunk = set(ids[k * step : (k + 1) * step])
        docs.filter(F.col("doc_id").isin(chunk)).coalesce(1).write.parquet(
            str(d / f"b{k}")
        )
    state = str(tmp_path / "state")
    _run_stream(spark, str(d), state, files_per_trigger=1)

    # final cumulative counts == exact corpus counts
    got_counts = {
        r["lang"]: r["n"] for r in read_mixture_counts(spark, state).collect()
    }
    want_counts = {
        r["lang"]: r["count"]
        for r in docs.filter(F.col("lang").isin(list(MIX_WEIGHTS)))
        .groupBy("lang")
        .count()
        .collect()
    }
    assert got_counts == want_counts
    # final implied rates == batch mixture_rates exactly
    t = min(n / MIX_WEIGHTS[g] for g, n in got_counts.items())
    got_rates = {g: MIX_WEIGHTS[g] * t / n for g, n in got_counts.items()}
    want_rates = {
        r["lang"]: r["keep_rate"]
        for r in mixture_rates(docs, "lang", MIX_WEIGHTS).collect()
    }
    assert got_rates == want_rates

    kept = read_kept_mixture(spark, state)
    batch_kept = {r["doc_id"] for r in _batch_kept(spark).collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # the LAST batch was gated with the exact full-corpus rates:
    # its keep decisions must match batch q67 doc-for-doc
    last_ids = set(ids[4 * step :])
    assert kept_ids & last_ids == batch_kept & last_ids
    # convergence: achieved shares within 10 points of batch shares
    # (earlier batches were gated with partial-corpus rates)
    n_kept = len(kept_ids)
    got_share = {
        r["lang"]: r["count"] / n_kept for r in kept.groupBy("lang").count().collect()
    }
    n_batch = len(batch_kept)
    want_share = {
        r["lang"]: r["count"] / n_batch
        for r in _batch_kept(spark).groupBy("lang").count().collect()
    }
    for g in MIX_WEIGHTS:
        assert abs(got_share.get(g, 0.0) - want_share.get(g, 0.0)) < 0.10, (
            g,
            got_share,
            want_share,
        )


def test_replayed_batch_is_noop(spark, tmp_path):
    """A redelivered batch_id must neither double-count the state nor
    change the kept set."""
    docs = _docs(spark).limit(100).cache()
    state = str(tmp_path / "state")
    merge_mixture_batch(docs, 0, state, MIX_WEIGHTS)
    counts1 = {r["lang"]: r["n"] for r in read_mixture_counts(spark, state).collect()}
    kept1 = {tuple(r) for r in read_kept_mixture(spark, state).collect()}
    merge_mixture_batch(docs, 0, state, MIX_WEIGHTS)  # replay
    counts2 = {r["lang"]: r["n"] for r in read_mixture_counts(spark, state).collect()}
    kept2 = {tuple(r) for r in read_kept_mixture(spark, state).collect()}
    assert counts1 == counts2 and kept1 == kept2
    docs.unpersist()


def test_empty_state_schema_follows_parameters(spark, tmp_path):
    """read_kept_mixture's before-any-data frame must carry the
    caller's column names/types, not the doc_id/lang defaults
    (round-6 advisory)."""
    from flink_assignment_spark.streaming.mixture_stream import read_kept_mixture

    df = read_kept_mixture(
        spark,
        str(tmp_path / "nope"),
        key_col="item",
        group_col="domain",
        key_type="string",
        group_type="string",
    )
    assert df.columns == ["item", "domain"]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string",
        "string",
    ]
    assert df.count() == 0

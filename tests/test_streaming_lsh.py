"""Streaming MinHash-LSH vs batch banding: the accumulated candidate
set equals the batch bucket-pair set (order-independent — new×old and
new×new cover each colliding pair exactly once), the signature
estimator matches its batch value, and every q16 exact-verified pair
is recalled."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.functions.text import MINHASH_PERMS
from flink_assignment_spark.operators.dedup import minhash_signatures
from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.lsh_stream import (
    incremental_lsh_neardup,
    read_candidate_pairs,
)

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
N_DOCS = 120
ROWS_PER_BAND = 2


def _batch_candidates(spark, docs):
    """Uncapped batch LSH bucket pairs + the exact estimator value,
    computed independently of the streaming code path."""
    sigs = minhash_signatures(docs).collect()
    by_doc = {r["doc_id"]: [r[f"mh{i}"] for i in range(len(MINHASH_PERMS))] for r in sigs}
    buckets = {}
    for d, sig in by_doc.items():
        for band in range(len(MINHASH_PERMS) // ROWS_PER_BAND):
            key = (band, tuple(sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]))
            buckets.setdefault(key, []).append(d)
    want = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                sa, sb = by_doc[a], by_doc[b]
                est = round(sum(x == y for x, y in zip(sa, sb)) / len(sa), 6)
                want[(a, b)] = est
    return want


def test_streaming_lsh_candidates_match_batch(spark, tmp_path):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .filter(F.col("doc_id") < N_DOCS)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # 6 micro-batches of ~20 docs; batching layout must not matter
    rows = docs.collect()
    for i in range(6):
        chunk = [r for r in rows if r.doc_id % 6 == i]
        spark.createDataFrame(chunk, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i}")
        )
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = incremental_lsh_neardup(stream, state_dir, rows_per_band=ROWS_PER_BAND)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in read_candidate_pairs(spark, state_dir).collect()
    }
    want = _batch_candidates(spark, docs)
    assert got == want and len(want) > 0

    # LSH recall contract: every exact-verified near-dup pair from the
    # batch q16 pipeline (restricted to this subset) must be a
    # streamed candidate
    verified = {
        (r.doc_a, r.doc_b)
        for r in REGISTRY["q16_dedup_minhash_lsh"].spark(spark, SF_DIR).collect()
        if r.doc_a < N_DOCS and r.doc_b < N_DOCS
    }
    assert verified and verified <= set(got)


def test_verify_candidates_closes_the_loop(spark, tmp_path):
    """Streamed candidates + batch exact verification == the batch
    q16 result on the same subset (threshold 0.3, uncapped stream
    candidates are a superset of the capped batch candidates)."""
    from flink_assignment_spark.streaming.lsh_stream import verify_candidates

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
        .filter(F.col("doc_id") < N_DOCS)
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = docs.collect()
    for i in range(3):
        chunk = [r for r in rows if r.doc_id % 3 == i]
        spark.createDataFrame(chunk, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i}")
        )
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = incremental_lsh_neardup(stream, state_dir, rows_per_band=ROWS_PER_BAND)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    verified = verify_candidates(docs, read_candidate_pairs(spark, state_dir), 0.3)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in verified.collect()}
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in REGISTRY["q16_dedup_minhash_lsh"].spark(spark, SF_DIR).collect()
        if r.doc_a < N_DOCS and r.doc_b < N_DOCS
    }
    # uncapped streamed candidates can only ADD pairs the capped batch
    # run dropped; every batch pair must match exactly
    assert want and set(want) <= set(got)
    for k, j in want.items():
        assert got[k] == j, k


def test_state_bucket_saturation_valve(spark, tmp_path):
    """With max_state_bucket set, a degenerate bucket (many identical
    docs) saturates: its key is tombstoned, later members emit no
    pairs, physical state stops growing (bounded by the cap), and
    compaction purges the masked rows WITHOUT losing stickiness — the
    streaming analogue of batch max_bucket."""
    from flink_assignment_spark.streaming._detector import (
        buckets_path as _buckets_path,
    )
    from flink_assignment_spark.streaming._detector import (
        compact_state,
        read_bucket_state,
        tombs_path,
    )
    from flink_assignment_spark.streaming.lsh_stream import merge_lsh_batch

    cap = 4
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # 3 waves of 4 identical docs: wave 1 fits the cap, wave 2 pushes
    # the bucket over it, wave 3 arrives saturated
    text = "alpha beta gamma delta epsilon zeta eta theta"
    for w in range(3):
        rows = [(w * 4 + i, text, "en", "s", 8) for i in range(4)]
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{w}")
        )
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = incremental_lsh_neardup(
        stream, state_dir, rows_per_band=ROWS_PER_BAND, max_state_bucket=cap
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # every bucket is saturated: tombstoned (one key each), zero LIVE
    # rows, and the physical leftovers are wave-1's rows only — the
    # over-cap waves were never appended
    assert read_bucket_state(spark, state_dir, ["band", "key"]).count() == 0
    physical = spark.read.parquet(_buckets_path(state_dir))
    n_buckets = physical.select("band", "key").distinct().count()
    assert physical.count() == n_buckets * cap > 0
    tombs = spark.read.parquet(tombs_path(state_dir))
    assert tombs.select("band", "key").distinct().count() == n_buckets
    # wave 1+2 pairs were emitted (cap crossed DURING wave 2, which
    # still scores before the fold); wave-3 docs (ids 8-11) never
    # appear — they arrived saturated
    got = {
        (r.doc_a, r.doc_b)
        for r in read_candidate_pairs(spark, state_dir).collect()
    }
    assert (0, 1) in got
    assert all(a < 8 and b < 8 for a, b in got), got

    # compaction purges the masked rows; stickiness survives — a
    # post-compaction member of the saturated bucket still emits
    # nothing and stores nothing
    compact_state(spark, state_dir, ["band", "key"], "sig")
    assert read_bucket_state(spark, state_dir, ["band", "key"]).count() == 0
    b3 = spark.createDataFrame([(20, text, "en", "s", 8)], DOCS_SCHEMA)
    merge_lsh_batch(b3, 3, state_dir, rows_per_band=ROWS_PER_BAND, max_state_bucket=cap)
    after = {
        (r.doc_a, r.doc_b)
        for r in read_candidate_pairs(spark, state_dir).collect()
    }
    assert after == got
    assert read_bucket_state(spark, state_dir, ["band", "key"]).count() == 0


def test_auto_compaction_trigger_preserves_results(spark, tmp_path):
    """compact_every folds + compacts inline every N batches: the
    accumulated pairs and live state are IDENTICAL to the untriggered
    run, the _compacted marker advances, and the compacted state holds
    fewer delta files (the unbounded-file-listing fix, r7 ask #5)."""
    import os

    from flink_assignment_spark.streaming._detector import (
        _compacted_batch,
        buckets_path,
        read_bucket_state,
    )
    from flink_assignment_spark.streaming.lsh_stream import merge_lsh_batch

    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < N_DOCS)
    )
    rows = docs.collect()

    def run(state_dir, compact_every):
        for b in range(6):
            chunk = [(r.doc_id, r.text) for r in rows if r.doc_id % 6 == b]
            batch = spark.createDataFrame(chunk, "doc_id long, text string")
            merge_lsh_batch(batch, b, str(state_dir), compact_every=compact_every)
        pairs = {
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in read_candidate_pairs(spark, str(state_dir)).collect()
        }
        state = {
            (r.band, r.key, r.doc_id)
            for r in read_bucket_state(
                spark, str(state_dir), ["band", "key"]
            ).collect()
        }
        files = sum(
            len(fs) for _, _, fs in os.walk(buckets_path(str(state_dir)))
        )
        return pairs, state, files

    plain_pairs, plain_state, plain_files = run(tmp_path / "plain", None)
    auto_pairs, auto_state, auto_files = run(tmp_path / "auto", 3)
    assert auto_pairs == plain_pairs and len(auto_pairs) > 0
    assert auto_state == plain_state and len(auto_state) > 0
    # trigger fired: batches 0..5, compact_every=3 → compactions at
    # batch 2 (2-(-1)>=3) and batch 5 (5-2>=3)
    assert _compacted_batch(str(tmp_path / "auto")) == 5
    assert _compacted_batch(str(tmp_path / "plain")) == -1
    assert auto_files < plain_files


def test_detector_uncheckpointed_restart_refused(spark, tmp_path):
    """Restarting the detector over an existing state dir WITHOUT a
    checkpoint is refused at construction: the fresh run's batch ids
    reset to 0 and the durable marker would silently skip them all
    (the r12-ADVICE data-loss class; the ANN/hardneg streams handle it
    with per-run markers, but the detector's fold is convergent — not
    reprocessable — so only an offset-resuming checkpoint is safe)."""
    import pytest

    from flink_assignment_spark.streaming._state import commit_marker

    state_dir = str(tmp_path / "state")
    docs = load_table(spark, SF_DIR, "documents").limit(8).select("doc_id", "text")
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    docs.coalesce(1).write.parquet(str(in_dir / "f0"))

    def _stream():
        return (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*")
        )

    # fresh state, no checkpoint: fine (single-run usage)
    q = incremental_lsh_neardup(_stream(), state_dir)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # a restart over the now-marked state dir without a checkpoint is
    # refused...
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_lsh_neardup(_stream(), state_dir)
    # ...and so is the simhash twin over a marked dir
    from flink_assignment_spark.streaming.simhash_stream import (
        incremental_simhash_neardup,
    )

    state2 = str(tmp_path / "state2")
    import os

    os.makedirs(state2, exist_ok=True)
    commit_marker(state2, 3)
    with pytest.raises(ValueError, match="applied-batch"):
        incremental_simhash_neardup(_stream(), state2)
    # with a checkpoint the restart is allowed
    q2 = incremental_lsh_neardup(
        _stream(), state_dir, checkpoint=str(tmp_path / "ckpt")
    )
    q2.stop()

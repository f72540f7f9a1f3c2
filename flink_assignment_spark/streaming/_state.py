"""Shared plain-parquet state protocol for foreachBatch sinks.

One copy of the mechanisms every incremental sink here needs: the
at-least-once replay marker, the staging-write → per-partition-swap
fold, the bounded delta append, and the backend seam that lets a
transactional table format replace all of it. A fix to any crash
contract lands in every sink at once instead of drifting across
verbatim copies.

Backend seam (the MERGE contract)
---------------------------------

Every sink folds state exclusively through a :class:`StateBackend`,
so a deployment backed by a transactional table format (Delta Lake /
Apache Iceberg) swaps one object instead of touching detector / CC /
novelty logic. A replacement backend must guarantee, for each method:

- ``fold(out, table, part_col, touched)`` — REPLACE the contents of
  the ``touched`` partitions with ``out``'s rows (a partition absent
  from ``out`` becomes empty). ``out`` MUST contain rows only for
  partitions in ``touched`` — both backends raise ``ValueError`` on a
  violation, identically (r7 ADVICE: they used to diverge, one
  silently dropping the extra partition's staged rows, the other
  silently replacing that partition's live files). Equivalent MERGE:
  delete-where ``part_col IN touched`` + insert, in ONE atomic
  commit. Atomicity may be per-partition at minimum (this parquet
  stand-in's level): callers' folds are SET UNIONS, so a replay over
  a partially-applied fold must converge — the backend must never
  expose a partition in a half-written state (readers see old or
  new, nothing else).
- ``append(out, table, part_col)`` — INSERT ``out``'s rows. Replays
  may re-append; callers either dedupe at read or pre-anti-join, so
  duplicate rows must be tolerated, not deduped by the backend.
- ``read(spark, table, part_col)`` — return the table's committed
  contents as a DataFrame (partition column included when
  ``part_col`` is given), or ``None`` when the table has never been
  committed. Reads must see only committed data (read isolation);
  `_SUCCESS`-style visibility markers are the plain-parquet
  approximation of a table snapshot, and
  :class:`ManifestStateBackend` shows the real thing — an atomic
  manifest swap giving snapshot isolation across ALL partitions at
  once (a crashed fold is entirely invisible, never half-visible).
- ``replace(out, table, meta)`` — REPLACE the WHOLE table with
  ``out``'s rows, committing the small ``meta`` dict (e.g. the
  applied-batch marker) atomically WITH the data: after any crash,
  ``read``/``read_meta`` expose the old (data, meta) pair or the new
  one, never a mix. This is the fold for group-cardinality /
  keeper-table state (mixture counts, the dedup-apply kept corpus)
  whose production form is a MERGE INTO rewriting only touched
  files; a whole-table rewrite is the honest plain-parquet stand-in.
- ``read_meta(table)`` — the ``meta`` dict committed with the
  current snapshot, or ``None`` before any replace.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def applied_batch(state_dir: str, marker: str = "_applied_batch") -> int:
    """Last fully-applied foreachBatch id, or -1. ``marker`` names the
    marker file — sinks whose folds are replay-idempotent scope it per
    query RUN (see :func:`run_marker`) so an uncheckpointed restart,
    whose batch ids reset to 0, cannot be silently masked by a stale
    marker from the previous run (r12 ADVICE: silent data loss in the
    documented blue/green refresh flow)."""
    path = os.path.join(state_dir, marker)
    if os.path.exists(path):
        with open(path) as f:
            return int(f.read().strip() or -1)
    return -1


def commit_marker(
    state_dir: str, batch_id: int, marker: str = "_applied_batch"
) -> None:
    """Atomically record ``batch_id`` as applied (tmp + rename). The
    state dir may not exist yet — a stream whose FIRST batches are
    empty (e.g. a reorder buffer holding everything back) commits
    markers before any fold has created the directory."""
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, marker + ".tmp")
    with open(tmp, "w") as f:
        f.write(str(int(batch_id)))
    os.replace(tmp, os.path.join(state_dir, marker))


def next_run_seq(state_dir: str) -> int:
    """Monotone per-state-dir run counter (tmp + rename), bumped once
    per streaming-query start. Appended result rows carry it so a
    reader can resolve cross-run duplicates LATEST-WINS: an
    uncheckpointed restart reprocesses the source under fresh batch
    ids, re-scoring rows the previous run already appended — batch
    boundaries need not line up, so a (batch_id, …) dedup alone keeps
    both copies (r13 review), and after a blue/green index swap the
    colliding keys would even carry different values. The run counter
    makes "which scoring is current" explicit."""
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, "_run_seq")
    cur = 0
    if os.path.exists(path):
        with open(path) as f:
            cur = int(f.read().strip() or 0)
    nxt = cur + 1
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(nxt))
    os.replace(tmp, path)
    return nxt


def require_restart_checkpoint(state_dir: str, checkpoint: str | None) -> None:
    """Refuse an uncheckpointed RESTART of a sink whose fold is
    convergent but not reprocessable (the bucketed detectors): their
    durable ``_applied_batch`` marker is correct only while batch ids
    keep increasing, and a checkpoint is what preserves that across
    restarts. Without one, a restarted query's batch ids reset to 0
    and every batch ≤ the marker is silently skipped — data loss with
    no error (the r12 ADVICE class). A FRESH state dir (no marker)
    with no checkpoint is fine: single-run usage never replays."""
    if checkpoint is None and applied_batch(state_dir) >= 0:
        raise ValueError(
            f"state dir {state_dir!r} holds a previous run's applied-batch "
            "marker; restarting without a checkpoint would reset batch ids "
            "to 0 and silently skip every batch the marker already covers — "
            "pass checkpoint= (resumes source offsets) or use a fresh "
            "state dir"
        )


def run_marker(checkpoint: str | None) -> str:
    """Replay-marker name for one streaming-query run.

    With a checkpoint, batch ids survive restarts, so the durable
    default marker is correct across runs (a restarted query resumes
    offsets and fully-applied ids stay skippable). WITHOUT a
    checkpoint, a restarted query's batch ids reset to 0 while a
    durable marker keeps its old high-water value — every post-restart
    batch with id <= marker would be silently skipped. A fresh
    per-run marker makes the uncheckpointed restart reprocess from
    scratch instead; the sinks that use it are replay-idempotent
    (append + read-side dedup, or a deterministic replace fold), so
    reprocessing converges to the same table."""
    if checkpoint is not None:
        return "_applied_batch"
    return f"_applied_batch-run-{uuid.uuid4().hex}"


def _check_int_parts(touched: list[int]) -> None:
    """Seam contract: partition values are plain ints. Int values are
    never escaped in Hive-style directory names, so the fold guards'
    raw ``part=<suffix>`` comparison is value-faithful; strings would
    need Spark's partition-path escaping (special chars, NULL →
    ``__HIVE_DEFAULT_PARTITION__``) undone before comparing, and the
    two backends could silently diverge on it. Enforced identically in
    :func:`swap_partitions` and :meth:`ManifestStateBackend.fold`."""
    bad = [p for p in touched if not isinstance(p, int) or isinstance(p, bool)]
    if bad:
        raise TypeError(
            f"state-backend partition values must be ints, got {bad!r} — "
            "the fold guard compares raw directory suffixes and only int "
            "values are escape-free in partition paths"
        )


def swap_partitions(
    out: DataFrame, table_path: str, part_col: str, touched: list[int]
) -> None:
    """Write ``out`` (which must contain ``part_col``) to a staging
    directory partitioned by ``part_col``, then swap ONLY the touched
    partition directories into ``table_path`` — the bounded-rewrite
    upsert on plain parquet (production: the same MERGE INTO through a
    transactional table format). Crash mid-swap leaves a prefix of the
    partitions updated; callers' folds must be set unions so a replay
    converges. ``_SUCCESS`` is only created when data was written.

    A touched partition whose staging output is EMPTY (no src dir) has
    its existing dst directory removed — "touched" means "this is the
    partition's new contents", including contents of zero rows.
    ``touched`` values must be ints (see :func:`_check_int_parts`)."""
    _check_int_parts(touched)
    staging = table_path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    out.write.partitionBy(part_col).parquet(staging)
    staged = {
        d.split("=", 1)[1]
        for d in os.listdir(staging)
        if d.startswith(f"{part_col}=")
    }
    extra = staged - {str(p) for p in touched}
    if extra:
        shutil.rmtree(staging)
        raise ValueError(
            f"fold contract violation: out contains partitions not in "
            f"touched: {sorted(extra)} (touched={sorted(map(str, touched))})"
        )
    os.makedirs(table_path, exist_ok=True)
    wrote_any = False
    for p in touched:
        src = os.path.join(staging, f"{part_col}={p}")
        dst = os.path.join(table_path, f"{part_col}={p}")
        if os.path.exists(dst):
            shutil.rmtree(dst)
        if os.path.exists(src):
            os.rename(src, dst)
            wrote_any = True
    shutil.rmtree(staging)
    if wrote_any or os.listdir(table_path):
        open(os.path.join(table_path, "_SUCCESS"), "a").close()


def append_rows(out: DataFrame, table_path: str, part_col: str | None) -> None:
    """Append ``out`` as new files (partition-pruned when ``part_col``
    is given) — the O(batch) fold for grow-only state, where the swap's
    full-partition rewrite would degenerate to O(state) once a batch
    touches every partition (the round-6 streaming-LSH finding).
    Production equivalent: a plain transactional INSERT. Duplicate
    rows from replays are the CALLER's contract (pre-anti-join or
    dedupe at read)."""
    w = out.write.mode("append")
    if part_col is not None:
        w = w.partitionBy(part_col)
    w.parquet(table_path)


def drop_if_drained(table_path: str, part_col: str = "bucket") -> None:
    """Remove a partitioned state dir whose every partition was folded
    away, leaving only a bare ``_SUCCESS`` marker — unreadable as
    parquet, so the next ``read`` would crash instead of returning
    None. One shared copy (r16 review: the k-anonymity and generalize
    gates each carried a verbatim inline block, exactly the drift this
    module exists to prevent). A no-op on the ManifestStateBackend's
    layout (no ``_SUCCESS`` file), where an emptied table already
    reads as None via its manifest."""
    if (
        os.path.isdir(table_path)
        and os.path.exists(os.path.join(table_path, "_SUCCESS"))
        and not any(
            e.startswith(f"{part_col}=") for e in os.listdir(table_path)
        )
    ):
        shutil.rmtree(table_path)


def recover_replace(table_path: str) -> None:
    """Heal a crash inside :meth:`ParquetStateBackend.replace`'s
    two-rename swap. The swap is (1) rename the current table aside to
    ``.old``, (2) rename staging in, (3) delete ``.old`` — so a
    leftover ``.old`` means either the crash hit between (1) and (2)
    (no live table: restore ``.old``) or between (2) and (3) (live
    table present: drop ``.old``)."""
    old = table_path + ".old"
    if not os.path.exists(old):
        return
    if os.path.exists(os.path.join(table_path, "_SUCCESS")):
        shutil.rmtree(old)
    else:
        if os.path.exists(table_path):
            shutil.rmtree(table_path)
        os.rename(old, table_path)


class ParquetStateBackend:
    """Default backend: plain-parquet directories with `_SUCCESS`
    visibility markers — the local stand-in for a transactional table.
    See the module docstring for the contract a MERGE-capable
    replacement must honor. Atomicity is per-partition (a crash
    mid-fold can expose a prefix of the touched partitions — callers
    carry set-union folds / WALs to converge on replay); ``replace``
    is whole-table atomic via the two-rename swap + healing."""

    def fold(
        self, out: DataFrame, table_path: str, part_col: str, touched: list[int]
    ) -> None:
        swap_partitions(out, table_path, part_col, touched)

    def append(self, out: DataFrame, table_path: str, part_col: str | None) -> None:
        append_rows(out, table_path, part_col)

    def read(
        self, spark: SparkSession, table_path: str, part_col: str | None = None
    ) -> DataFrame | None:
        recover_replace(table_path)
        if not os.path.exists(os.path.join(table_path, "_SUCCESS")):
            return None
        reader = spark.read
        if part_col is not None:
            reader = reader.option("basePath", table_path)
        return reader.parquet(table_path)

    def replace(
        self, out: DataFrame, table_path: str, meta: dict | None = None
    ) -> None:
        """Whole-table replace; ``meta`` commits atomically with the
        data (it travels INSIDE the staging directory, so the pair
        becomes visible in the same rename). ``meta=None`` CARRIES the
        existing meta forward (same semantic as
        :meth:`ManifestStateBackend.replace` — a replace that doesn't
        mention meta must not reset replay protection). The staging
        write materializes ``out`` — which may still read the table's
        current directory — BEFORE anything is moved."""
        recover_replace(table_path)
        if meta is None:
            meta = self.read_meta(table_path)
        staging = table_path + ".staging"
        if os.path.exists(staging):
            shutil.rmtree(staging)
        out.write.parquet(staging)
        if meta is not None:
            with open(os.path.join(staging, "_meta.json"), "w") as f:
                json.dump(meta, f)
        old = table_path + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(table_path):
            os.rename(table_path, old)
        os.rename(staging, table_path)
        if os.path.exists(old):
            shutil.rmtree(old)

    def read_meta(self, table_path: str) -> dict | None:
        recover_replace(table_path)
        path = os.path.join(table_path, "_meta.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)


class ManifestStateBackend:
    """Snapshot-isolated backend on plain parquet — the in-repo proof
    that the seam's MERGE contract is implementable without a
    dependency, and the shape a Delta/Iceberg binding would take.

    Layout: ``<table>/data/[pt=X/]<uuid>.parquet`` immutable data
    files plus ``<table>/_manifest.json`` mapping each partition value
    (or ``"_all"`` for unpartitioned tables) to its live file list.
    Every fold/append stages new files into ``data/`` (unreferenced =
    invisible) and commits by atomically replacing the manifest
    (tmp + ``os.replace``) — so a fold is visible either in full or
    not at all, across ALL partitions at once: the per-partition
    crash windows the default backend's callers must tolerate
    (components' merge-intent WAL, the detector's ``_appended``
    marker) cannot occur here by construction. Readers resolve the
    manifest to an explicit file list, seeing exactly one snapshot.
    Superseded files are garbage until :meth:`vacuum`."""

    def _manifest_path(self, table_path: str) -> str:
        return os.path.join(table_path, "_manifest.json")

    def _load(self, table_path: str) -> dict | None:
        path = self._manifest_path(table_path)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _commit(self, table_path: str, manifest: dict) -> None:
        tmp = self._manifest_path(table_path) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table_path))

    def _stage_files(
        self, out: DataFrame, table_path: str, part_col: str | None
    ) -> dict[str, list[str]]:
        """Write ``out`` into data/ as immutable uniquely-named files;
        returns {part_value: [relative paths]} of the NEW files (not
        yet referenced by any manifest)."""
        data = os.path.join(table_path, "data")
        staging = os.path.join(table_path, f"_staging-{uuid.uuid4().hex}")
        w = out.write
        if part_col is not None:
            w = w.partitionBy(part_col)
        w.parquet(staging)
        added: dict[str, list[str]] = {}
        src_dirs = (
            [
                (d.split("=", 1)[1], os.path.join(staging, d))
                for d in os.listdir(staging)
                if d.startswith(f"{part_col}=")
            ]
            if part_col is not None
            else [("_all", staging)]
        )
        for part_value, src in src_dirs:
            rel_dir = f"{part_col}={part_value}" if part_col is not None else ""
            os.makedirs(os.path.join(data, rel_dir), exist_ok=True)
            for fn in os.listdir(src):
                if not fn.endswith(".parquet"):
                    continue
                rel = os.path.join(rel_dir, f"{uuid.uuid4().hex}.parquet")
                os.rename(os.path.join(src, fn), os.path.join(data, rel))
                added.setdefault(part_value, []).append(rel)
        shutil.rmtree(staging)
        return added

    def fold(
        self, out: DataFrame, table_path: str, part_col: str, touched: list[int]
    ) -> None:
        _check_int_parts(touched)
        added = self._stage_files(out, table_path, part_col)
        extra = set(added) - {str(p) for p in touched}
        if extra:
            # staged files are unreferenced (invisible); vacuum reclaims
            raise ValueError(
                f"fold contract violation: out contains partitions not in "
                f"touched: {sorted(extra)} (touched={sorted(map(str, touched))})"
            )
        manifest = self._load(table_path) or {"version": 0, "parts": {}}
        parts = dict(manifest["parts"])
        for p in touched:  # replace semantics: empty output clears the part
            parts.pop(str(p), None)
        for part_value, files in added.items():
            parts[str(part_value)] = files
        self._commit(table_path, {"version": manifest["version"] + 1, "parts": parts})

    def append(self, out: DataFrame, table_path: str, part_col: str | None) -> None:
        added = self._stage_files(out, table_path, part_col)
        manifest = self._load(table_path) or {"version": 0, "parts": {}}
        parts = {k: list(v) for k, v in manifest["parts"].items()}
        for part_value, files in added.items():
            parts.setdefault(str(part_value), []).extend(files)
        self._commit(table_path, {"version": manifest["version"] + 1, "parts": parts})

    def read(
        self, spark: SparkSession, table_path: str, part_col: str | None = None
    ) -> DataFrame | None:
        manifest = self._load(table_path)
        if manifest is None or not manifest["parts"]:
            return None
        data = os.path.join(table_path, "data")
        files = [
            os.path.join(data, rel)
            for file_list in manifest["parts"].values()
            for rel in file_list
        ]
        if not files:
            return None
        reader = spark.read
        if part_col is not None:
            reader = reader.option("basePath", data)
        return reader.parquet(*files)

    def replace(
        self, out: DataFrame, table_path: str, meta: dict | None = None
    ) -> None:
        """Whole-table replace in ONE manifest commit; ``meta`` lives
        inside the manifest JSON itself, so data and marker are
        atomic by construction — a crashed replace leaves the previous
        (data, meta) snapshot fully intact."""
        added = self._stage_files(out, table_path, None)
        manifest = self._load(table_path) or {"version": 0, "parts": {}}
        commit = {
            "version": manifest["version"] + 1,
            "parts": {"_all": added.get("_all", [])},
        }
        if meta is not None:
            commit["meta"] = meta
        elif "meta" in manifest:
            commit["meta"] = manifest["meta"]
        self._commit(table_path, commit)

    def read_meta(self, table_path: str) -> dict | None:
        manifest = self._load(table_path)
        return None if manifest is None else manifest.get("meta")

    def vacuum(self, table_path: str) -> int:
        """Delete data files no manifest snapshot references (plus any
        staging directory a crashed writer left behind); returns the
        number of data files removed. Run out-of-band (single writer
        owns the table, so 'current manifest' is the only live
        snapshot)."""
        if os.path.isdir(table_path):
            for entry in os.listdir(table_path):
                if entry.startswith("_staging-"):
                    shutil.rmtree(os.path.join(table_path, entry))
        manifest = self._load(table_path) or {"parts": {}}
        live = {
            rel for file_list in manifest["parts"].values() for rel in file_list
        }
        data = os.path.join(table_path, "data")
        removed = 0
        for root, _dirs, files in os.walk(data):
            for fn in files:
                rel = os.path.relpath(os.path.join(root, fn), data)
                if rel not in live and fn.endswith(".parquet"):
                    os.remove(os.path.join(root, fn))
                    removed += 1
        return removed


DEFAULT_BACKEND = ParquetStateBackend()


def fold_state(
    out: DataFrame,
    table_path: str,
    part_col: str,
    touched: list[int],
    backend: ParquetStateBackend | None = None,
) -> None:
    """Fold through the backend seam (partition replace semantics)."""
    (backend or DEFAULT_BACKEND).fold(out, table_path, part_col, touched)


def append_state(
    out: DataFrame,
    table_path: str,
    part_col: str | None = None,
    backend: ParquetStateBackend | None = None,
) -> None:
    """Append through the backend seam (insert semantics)."""
    (backend or DEFAULT_BACKEND).append(out, table_path, part_col)

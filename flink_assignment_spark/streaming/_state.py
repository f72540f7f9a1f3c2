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
  from ``out`` becomes empty). Equivalent MERGE: delete-where
  ``part_col IN touched`` + insert, in ONE atomic commit. Atomicity
  may be per-partition at minimum (this parquet stand-in's level):
  callers' folds are SET UNIONS, so a replay over a partially-applied
  fold must converge — the backend must never expose a partition in a
  half-written state (readers see old or new, nothing else).
- ``append(out, table, part_col)`` — INSERT ``out``'s rows. Replays
  may re-append; callers either dedupe at read or pre-anti-join, so
  duplicate rows must be tolerated, not deduped by the backend.
- Reads through the engine's normal table scan must see only
  committed data (read isolation); `_SUCCESS`-style visibility
  markers are this stand-in's approximation of a table snapshot.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def applied_batch(state_dir: str) -> int:
    """Last fully-applied foreachBatch id, or -1."""
    marker = os.path.join(state_dir, "_applied_batch")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip() or -1)
    return -1


def commit_marker(state_dir: str, batch_id: int) -> None:
    """Atomically record ``batch_id`` as applied (tmp + rename)."""
    tmp = os.path.join(state_dir, "_applied_batch.tmp")
    with open(tmp, "w") as f:
        f.write(str(int(batch_id)))
    os.replace(tmp, os.path.join(state_dir, "_applied_batch"))


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
    partition's new contents", including contents of zero rows."""
    staging = table_path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    out.write.partitionBy(part_col).parquet(staging)
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


class ParquetStateBackend:
    """Default backend: plain-parquet directories with `_SUCCESS`
    visibility markers — the local stand-in for a transactional table.
    See the module docstring for the contract a MERGE-capable
    replacement must honor."""

    def fold(
        self, out: DataFrame, table_path: str, part_col: str, touched: list[int]
    ) -> None:
        swap_partitions(out, table_path, part_col, touched)

    def append(self, out: DataFrame, table_path: str, part_col: str | None) -> None:
        append_rows(out, table_path, part_col)


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

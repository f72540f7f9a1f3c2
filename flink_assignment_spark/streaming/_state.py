"""Shared plain-parquet state protocol for foreachBatch sinks.

One copy of the two mechanisms every incremental sink here needs
(novelty, LSH near-dup): the at-least-once replay marker and the
staging-write → per-partition-swap fold. A fix to either crash
contract lands in every sink at once instead of drifting across
verbatim copies.
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

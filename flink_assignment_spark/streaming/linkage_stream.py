"""Incremental record linkage — the streaming twin of q125
(operators/linkage.fuzzy_pairs, any max_dist; k=1 default).

An entity table ingested live must surface fuzzy matches the moment a
record lands: each arriving record pairs against every previously-seen
record within Levenshtein distance 1 AND against the other records of
its own micro-batch. State under ``foreachBatch``:

- ``variants/`` — the FastSS deletion-neighborhood index:
  ``(bucket, var, rid, name)``, one row per (record, variant),
  hash-bucket-partitioned on the variant. INSERT-ONLY (a record's
  variant set never changes), so the fold is a pure delta-append —
  O(batch) per micro-batch regardless of index size, the same
  non-degenerating shape as the split stream's group map
  (``compact_variants`` is the out-of-band OPTIMIZE).
- ``pairs/`` — appended match rows
  ``(id_a, id_b, dist, batch_id)`` with id_a < id_b.

Per batch: derive the batch's variant rows once; candidates are the
batch-internal variant self-join PLUS the probe of batch variants
against the state index (partition-pruned to the touched buckets);
verify with the JVM-side ``levenshtein`` on the candidate pairs only
— the identical kernel split batch q125 compiles, so an in-order
replay reproduces the batch pair set row-for-row (pinned by
tests/test_streaming_linkage.py).

Replay (foreachBatch is at-least-once): pairs-append → variants-append
→ marker. A fully-applied redelivery is skipped by the marker; a
replay that raced it re-derives the SAME pairs (state probe may now
also see the batch's own variants — those rediscoveries are exact
duplicates of the batch-internal pairs) and ``read_pairs`` drops
duplicates by (id_a, id_b). The fold converges from every crash
point.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import hash60
from ..operators.linkage import deletion_neighborhood
from ._state import (
    DEFAULT_BACKEND,
    applied_batch,
    commit_marker,
    require_restart_checkpoint,
)

N_BUCKETS = 64


def _variants_path(state_dir: str) -> str:
    return os.path.join(state_dir, "variants")


def _pairs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "pairs")


def _resolve_max_dist(state_dir: str, requested: int) -> int:
    """Pin max_dist at first fold (the _detector n_pt pattern): the
    variant index is only complete for the k it was built with, so a
    caller changing the parameter mid-stream must fail loudly, not
    silently miss pairs."""
    path = os.path.join(state_dir, "_max_dist")
    if os.path.exists(path):
        with open(path) as f:
            pinned = int(f.read().strip())
        if pinned != requested:
            raise ValueError(
                f"linkage state at {state_dir!r} was built with "
                f"max_dist={pinned}; got {requested} — the index is only "
                "complete for the distance it was built with (rebuild, or "
                "keep the pinned value)"
            )
        return pinned
    os.makedirs(state_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(int(requested)))
    os.replace(tmp, path)
    return requested


def _variant_rows(
    batch_df: DataFrame, id_col: str, name_col: str, max_dist: int
) -> DataFrame:
    v = (
        batch_df.select(F.col(id_col).alias("rid"), F.col(name_col).alias("name"))
        .select(
            "rid",
            "name",
            F.explode_outer(
                deletion_neighborhood(F.col("name"), max_dist)
            ).alias("var"),
        )
        .filter(F.col("var").isNotNull())
    )
    return v.withColumn(
        "bucket", F.pmod(hash60(F.col("var")), F.lit(N_BUCKETS)).cast("int")
    )


def merge_linkage_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    id_col: str = "rid",
    name_col: str = "name",
    max_dist: int = 1,
    backend=None,
) -> None:
    """Match one micro-batch against itself and the seen-record index,
    then extend the index — see the module docstring for the
    crash/replay contract. ``max_dist`` generalizes the candidate
    neighborhood to any edit distance (operators/linkage.fuzzy_pairs;
    lossless at every k) and is PINNED at first fold — the index is
    only complete for the k it was built with."""
    if batch_id <= applied_batch(state_dir):
        return
    max_dist = _resolve_max_dist(state_dir, max_dist)
    backend = backend or DEFAULT_BACKEND
    spark = batch_df.sparkSession
    var_path, pairs_path = _variants_path(state_dir), _pairs_path(state_dir)

    v = _variant_rows(batch_df, id_col, name_col, max_dist).cache()
    if v.count() == 0:
        v.unpersist()
        commit_marker(state_dir, batch_id)
        return

    # batch-internal candidates (both sides new this batch)
    a, b = v.alias("a"), v.alias("b")
    internal = a.join(
        b,
        (F.col("a.var") == F.col("b.var")) & (F.col("a.rid") < F.col("b.rid")),
    ).select(
        F.col("a.rid").alias("id_a"),
        F.col("b.rid").alias("id_b"),
        F.col("a.name").alias("name_a"),
        F.col("b.name").alias("name_b"),
    )

    state = backend.read(spark, var_path, "bucket")
    if state is not None:
        touched_probe = [
            int(r.bucket) for r in v.select("bucket").distinct().collect()
        ]
        seen = state.filter(F.col("bucket").isin(touched_probe))
        # cross-batch candidates: new record (larger or smaller id)
        # vs seen record — order the pair by id, not by arrival
        cross = v.alias("n").join(
            seen.alias("s"),
            (F.col("n.var") == F.col("s.var")) & (F.col("n.rid") != F.col("s.rid")),
        ).select(
            F.least("n.rid", "s.rid").alias("id_a"),
            F.greatest("n.rid", "s.rid").alias("id_b"),
            F.when(F.col("n.rid") < F.col("s.rid"), F.col("n.name"))
            .otherwise(F.col("s.name"))
            .alias("name_a"),
            F.when(F.col("n.rid") < F.col("s.rid"), F.col("s.name"))
            .otherwise(F.col("n.name"))
            .alias("name_b"),
        )
        cand = internal.unionByName(cross)
    else:
        cand = internal

    pairs = (
        cand.distinct()
        .filter(F.levenshtein("name_a", "name_b") <= max_dist)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
            F.lit(int(batch_id)).cast("bigint").alias("batch_id"),
        )
    )
    backend.append(pairs.coalesce(8), pairs_path, None)
    # insert-only index ⇒ pure delta-append; repartition first so each
    # touched bucket gains ONE file per batch (split_stream's finding)
    backend.append(
        v.select("var", "rid", "name", "bucket").repartition("bucket"),
        var_path,
        "bucket",
    )
    v.unpersist()
    commit_marker(state_dir, batch_id)


def read_pairs(spark: SparkSession, state_dir: str, backend=None) -> DataFrame:
    """All fuzzy pairs found so far — replay duplicates and
    cross-batch rediscoveries dropped by (id_a, id_b)."""
    backend = backend or DEFAULT_BACKEND
    pairs = backend.read(spark, _pairs_path(state_dir))
    if pairs is None:
        raise ValueError(f"no linkage state at {state_dir}")
    return pairs.dropDuplicates(["id_a", "id_b"]).select("id_a", "id_b", "dist")


def compact_variants(spark: SparkSession, state_dir: str, backend=None) -> None:
    """Out-of-band OPTIMIZE: rewrite the delta-appended variant index
    as one deduplicated table (replayed appends leave exact row
    duplicates, which only fan the probe into pair rows the reader
    already drops)."""
    backend = backend or DEFAULT_BACKEND
    path = _variants_path(state_dir)
    cur = backend.read(spark, path, "bucket")
    if cur is None:
        return
    all_buckets = [int(r.bucket) for r in cur.select("bucket").distinct().collect()]
    backend.fold(
        cur.dropDuplicates(["var", "rid"]).select("var", "rid", "name", "bucket"),
        path,
        "bucket",
        all_buckets,
    )


def incremental_linkage(
    records: DataFrame,
    state_dir: str,
    id_col: str = "rid",
    name_col: str = "name",
    max_dist: int = 1,
    backend=None,
    checkpoint: str | None = None,
):
    """Start the linkage query; returns the StreamingQuery.

    The variant-index fold is insert-only (convergent) but NOT
    reprocessable under reset batch ids — an uncheckpointed restart
    over existing state would skip every batch ≤ the stale marker,
    silently dropping records from the index and the pair output — so
    a restart requires a checkpoint, like scd2/gapfill.
    """
    require_restart_checkpoint(state_dir, checkpoint)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_linkage_batch(
            batch_df, batch_id, state_dir, id_col, name_col, max_dist, backend
        )

    w = records.writeStream.outputMode("append").foreachBatch(_sink)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()

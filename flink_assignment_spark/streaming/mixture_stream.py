"""Incremental mixture rebalancing — the streaming twin of q67.

Batch q67's keep-rates are GLOBAL scalars (T = min_g(n_g / w_g),
rate_g = w_g·T/n_g) that change as the corpus grows, so a stream
cannot gate with "the" rates — it gates each micro-batch with the
rates implied by the corpus SO FAR. This module maintains, under a
``foreachBatch`` sink:

- ``counts/`` — cumulative per-group doc counts for the weighted
  groups (group-cardinality: a handful of rows, rewritten per batch
  via the same marker-inside-staging two-rename swap as
  ``dedup_apply`` — the ``_applied_batch`` marker commits atomically
  with the fold, so a replayed batch can never double-count).
- ``kept/`` — appended kept docs ``(key, group)``. A replay that
  raced the marker may re-append a batch; the keep decision is a
  deterministic hash against rates derived from identical counts, so
  re-appended rows are byte-identical duplicates —
  :func:`read_kept_mixture` drops them by key.

Per batch: fold the batch's group counts into state FIRST, derive
rates from the post-fold counts, then gate the batch's docs with the
batch-q67 uniform-hash rule. Gating after the fold makes the
semantics exact at the boundary: a single-batch replay IS batch q67
(same counts, same T, same per-doc decisions), and on a multi-batch
replay the final batch is gated with exactly the full-corpus batch
rates. Earlier batches were gated with earlier (noisier) rates —
that is the inherent price of incremental rebalancing; as cumulative
counts converge to the corpus frequencies the per-batch rates
converge to batch q67's, and the achieved mixture with them
(pinned with tolerance in tests/test_streaming_mixture.py).

Batch q67 raises on a weighted group with zero corpus rows
(infeasible mixture). A stream cannot distinguish "not yet arrived"
from "absent", so here T is computed over weighted groups SEEN so
far and absent groups simply don't constrain it yet — the stream
converges to the batch answer when every weighted group eventually
appears, which is exactly when batch q67 is feasible.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sampling import uniform_from_key
from .dedup_apply import _recover_swap


def _counts_path(state_dir: str) -> str:
    return os.path.join(state_dir, "counts")


def _kept_path(state_dir: str) -> str:
    return os.path.join(state_dir, "kept")


def _applied_batch(counts_path: str) -> int:
    marker = os.path.join(counts_path, "_applied_batch")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip() or -1)
    return -1


def merge_mixture_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
    group_col: str = "lang",
    salt: str = "mix",
) -> None:
    """Fold one micro-batch into the count state and append its kept
    docs, gated by the post-fold rates."""
    cpath = _counts_path(state_dir)
    _recover_swap(cpath)
    if batch_id <= _applied_batch(cpath):
        return
    spark = batch_df.sparkSession
    os.makedirs(state_dir, exist_ok=True)

    weighted = batch_df.filter(F.col(group_col).isin(list(weights)))
    batch_counts = weighted.groupBy(group_col).agg(F.count("*").alias("n"))
    if os.path.exists(os.path.join(cpath, "_SUCCESS")):
        old = spark.read.parquet(cpath).select(group_col, "n")
        merged_df = (
            old.unionByName(batch_counts)
            .groupBy(group_col)
            .agg(F.sum("n").alias("n"))
        )
    else:
        merged_df = batch_counts
    # group-cardinality collect (a handful of rows) — the same bounded
    # driver action as batch mixture_rates
    merged = {r[group_col]: int(r["n"]) for r in merged_df.collect()}

    if merged:
        t = min(n / weights[g] for g, n in merged.items())
        rates = [(g, weights[g] * t / n) for g, n in merged.items()]
        rates_df = spark.createDataFrame(
            rates, f"{group_col} string, keep_rate double"
        )
        kept = weighted.join(F.broadcast(rates_df), group_col).filter(
            uniform_from_key(F.col(key_col), salt) < F.col("keep_rate")
        )
        kept.select(key_col, group_col).write.mode("append").parquet(
            _kept_path(state_dir)
        )

    # counts fold + marker commit in one atomic rename (two-rename
    # swap, crash-recoverable — see dedup_apply)
    staging = cpath + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    out = spark.createDataFrame(
        list(merged.items()), f"{group_col} string, n long"
    )
    out.coalesce(1).write.parquet(staging)
    with open(os.path.join(staging, "_applied_batch"), "w") as f:
        f.write(str(int(batch_id)))
    old_dir = cpath + ".old"
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)
    if os.path.exists(cpath):
        os.rename(cpath, old_dir)
    os.rename(staging, cpath)
    if os.path.exists(old_dir):
        shutil.rmtree(old_dir)


def incremental_mixture_rebalance(
    docs: DataFrame,
    state_dir: str,
    weights: dict[str, float],
    key_col: str = "doc_id",
    group_col: str = "lang",
    salt: str = "mix",
):
    """Start the rebalancing query; returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_mixture_batch(
            batch_df, batch_id, state_dir, weights, key_col, group_col, salt
        )

    return docs.writeStream.outputMode("append").foreachBatch(_sink).start()


def read_kept_mixture(
    spark: SparkSession,
    state_dir: str,
    key_col: str = "doc_id",
    group_col: str = "lang",
    key_type: str = "long",
    group_type: str = "string",
) -> DataFrame:
    """The accumulated kept corpus (replay duplicates dropped by key).
    The before-any-data frame is built from the SAME column names and
    types the caller gave ``merge_mixture_batch`` (round-6 advisory:
    it was hardcoded to ``doc_id long, lang string``, mismatching
    non-default streams)."""
    path = _kept_path(state_dir)
    if not os.path.exists(path):
        return spark.createDataFrame(
            [], f"{key_col} {key_type}, {group_col} {group_type}"
        )
    return spark.read.parquet(path).dropDuplicates([key_col])


def read_mixture_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    """Cumulative per-group counts: ``(group, n)``."""
    cpath = _counts_path(state_dir)
    _recover_swap(cpath)
    return spark.read.parquet(cpath)

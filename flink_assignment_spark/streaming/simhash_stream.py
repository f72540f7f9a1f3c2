"""Streaming SimHash near-duplicate detection.

The incremental form of batch q17 and the sibling of
``streaming.lsh_stream``: each arriving micro-batch is SimHash-
fingerprinted (the SAME frequency-weighted 48-bit fingerprint as
``operators.dedup.simhash_fingerprints`` — a per-document value, so
batching cannot change it), pigeonhole-blocked with the SAME
``blocked_fingerprints`` helper the batch join uses, and joined
against the corpus-so-far's block state. Unlike MinHash-LSH — whose
streamed output is candidate ESTIMATES needing a later exact-verify
pass — the Hamming distance is an exact popcount over the two stored
fingerprints, so the pairs this stream appends are FINAL verified
near-dups (``hamming ≤ max_hamming``), no second pass.

State layout under ``state_dir`` (both via ``streaming._state``):

- ``blocks/pt=K/`` — one row per (blk, val, doc_id, fp);
  ``pt = crc32(blk|val) % N_PT`` bounds each batch's rewrite to
  touched partitions.
- ``pairs/`` — appended ``(doc_a, doc_b, hamming)``.

Order-independence: for any qualifying pair, the later-arriving doc
meets the earlier one in block state (new×old) or both share a
micro-batch (new×new) — each pair is found exactly once either way,
so the accumulated pair set equals batch ``simhash_pairs`` regardless
of batching (pinned in tests/test_streaming_simhash.py).

``max_state_bucket`` is the sticky saturation valve copied from the
LSH stream: a (blk, val) cell crossing the cap collapses to a
tombstone, stops emitting, and stops growing — recall sacrificed only
on degenerate near-constant fingerprints, state and per-key fan-out
bounded for the stream's lifetime. Replay: ``_applied_batch`` marker;
pair appends may duplicate and are distinct'd at read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    SIMHASH_BITS,
    blocked_fingerprints,
    simhash_fingerprints,
)
from ._state import applied_batch, commit_marker, swap_partitions

N_PT = 64


def _blocks_path(state_dir: str) -> str:
    return os.path.join(state_dir, "blocks")


def _pairs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "pairs")


def _ham(fp_a, fp_b):
    return F.bit_count(fp_a.bitwiseXOR(fp_b)).cast("int")


def merge_simhash_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    max_hamming: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_state_bucket: int | None = None,
) -> None:
    """Detect the batch's verified near-dup pairs against state +
    within the batch, append them, and fold the batch into state."""
    if batch_id <= applied_batch(state_dir):
        return
    spark = batch_df.sparkSession
    bpath = _blocks_path(state_dir)
    fps = simhash_fingerprints(batch_df, text_col, id_col)
    blocked = blocked_fingerprints(
        fps, "doc_id", "simhash", SIMHASH_BITS, max_hamming
    ).withColumn(
        "pt", F.pmod(F.crc32(F.concat_ws("|", "blk", "val")), F.lit(N_PT)).cast("int")
    ).cache()
    touched = [int(r.pt) for r in blocked.select("pt").distinct().collect()]
    if not touched:
        blocked.unpersist()
        commit_marker(state_dir, batch_id)
        return

    have_state = os.path.exists(os.path.join(bpath, "_SUCCESS"))
    if have_state:
        state = (
            spark.read.option("basePath", bpath)
            .parquet(bpath)
            .filter(F.col("pt").isin(touched))
            .cache()
        )
        live = state.filter(F.col("doc_id").isNotNull())
        new_old = (
            blocked.alias("n")
            .join(
                live.alias("o"),
                (F.col("n.blk") == F.col("o.blk"))
                & (F.col("n.val") == F.col("o.val"))
                & (F.col("n.doc_id") != F.col("o.doc_id")),
            )
            .select(
                F.least("n.doc_id", "o.doc_id").alias("doc_a"),
                F.greatest("n.doc_id", "o.doc_id").alias("doc_b"),
                _ham(F.col("n.fp"), F.col("o.fp")).alias("hamming"),
            )
        )
        tombstoned = state.filter(F.col("doc_id").isNull()).select("blk", "val")
        new_new_src = blocked.join(
            F.broadcast(tombstoned), ["blk", "val"], "left_anti"
        )
    else:
        state = None
        new_old = None
        new_new_src = blocked
    new_new = (
        new_new_src.alias("a")
        .join(
            new_new_src.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            _ham(F.col("a.fp"), F.col("b.fp")).alias("hamming"),
        )
    )
    pairs = (
        (new_new if new_old is None else new_new.unionByName(new_old))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .cache()
    )
    if pairs.count():
        pairs.write.mode("append").parquet(_pairs_path(state_dir))
    pairs.unpersist()

    out = blocked.select("pt", "blk", "val", "doc_id", "fp")
    if state is not None:
        out = state.select("pt", "blk", "val", "doc_id", "fp").unionByName(out)
    out = out.distinct()
    if max_state_bucket is not None:
        keys = ["pt", "blk", "val"]
        as_tomb = lambda df: df.select(  # noqa: E731
            *keys,
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("long").alias("fp"),
        )
        old_tombs = out.filter(F.col("doc_id").isNull()).select(*keys).distinct()
        live = out.filter(F.col("doc_id").isNotNull()).join(
            F.broadcast(old_tombs), keys, "left_anti"
        )
        hot = (
            live.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_state_bucket)
            .select(*keys)
        )
        out = (
            live.join(F.broadcast(hot), keys, "left_anti")
            .unionByName(as_tomb(old_tombs))
            .unionByName(as_tomb(hot))
        )
    swap_partitions(
        out.select("blk", "val", "doc_id", "fp", "pt"), bpath, "pt", touched
    )
    if state is not None:
        state.unpersist()
    blocked.unpersist()
    commit_marker(state_dir, batch_id)


def incremental_simhash_neardup(
    docs: DataFrame,
    state_dir: str,
    max_hamming: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_state_bucket: int | None = None,
):
    """Start the streaming near-dup query; returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_simhash_batch(
            batch_df,
            batch_id,
            state_dir,
            max_hamming,
            text_col,
            id_col,
            max_state_bucket,
        )

    return docs.writeStream.outputMode("append").foreachBatch(_sink).start()


def read_verified_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated distinct VERIFIED near-dup pairs (exact Hamming —
    no later verify pass needed). Empty typed frame before the first
    collision."""
    path = _pairs_path(state_dir)
    if not os.path.exists(path):
        return spark.createDataFrame([], "doc_a long, doc_b long, hamming int")
    return spark.read.parquet(path).distinct()

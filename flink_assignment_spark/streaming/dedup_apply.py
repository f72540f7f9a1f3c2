"""Incremental dedup APPLY: maintain the kept corpus as a stream sink.

Closes the detect → apply loop in streaming form: ``exact_dedup_stream``
detects survivors, this module's ``foreachBatch`` sink maintains the
q62-style kept-corpus table (one row per distinct text: keeper doc +
group size) INCREMENTALLY — no batch recomputation over history.

Merge semantics per micro-batch (an upsert keyed on ``text_hash``):

- new hash → insert the batch's min-``id_col`` doc with its batch count;
- existing hash → keep the existing keeper row, add the batch count to
  ``n_dups``.

``n_dups`` is therefore EXACT regardless of arrival order (counts are
additive, and the ``_applied_batch`` marker — committed in the same
atomic rename as the data — makes redelivered batches no-ops, so
at-least-once replay cannot double-count). The keeper matches batch ``q62_dedup_apply``'s min-id keeper
whenever ids ascend with arrival order (the in-order replay contract
shared with the other streaming operators); under out-of-order id
arrival the keeper is first-seen-batch-min instead — same survivor
count, possibly a different representative.

Scale shape: the merge is a full-outer join on ``text_hash`` between
the existing kept table and ONE micro-batch's aggregated groups — at
100 TB this is a storage-layer ``MERGE INTO`` (Delta/Iceberg) that
rewrites only the touched files; on plain parquet (this container) the
table is rewritten per batch via an atomic staging-directory swap,
which is the honest local stand-in, not the production path.
Single-writer assumption: one streaming query owns ``table_path``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _table_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _recover_swap(table_path: str) -> None:
    """Heal a crash inside the two-rename swap. The swap is
    (1) rename current table aside to ``.old``, (2) rename staging in,
    (3) delete ``.old`` — so a leftover ``.old`` means either the
    crash hit between (1) and (2) (no live table: restore ``.old``)
    or between (2) and (3) (live table present: drop ``.old``)."""
    old = table_path + ".old"
    if not os.path.exists(old):
        return
    if _table_exists(table_path):
        shutil.rmtree(old)
    else:
        if os.path.exists(table_path):
            shutil.rmtree(table_path)
        os.rename(old, table_path)


def _applied_batch(table_path: str) -> int:
    marker = os.path.join(table_path, "_applied_batch")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip() or -1)
    return -1


def merge_dedup_groups(
    batch_df: DataFrame,
    table_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
    batch_id: int | None = None,
) -> None:
    """Upsert one micro-batch's exact-dup groups into the kept table.

    Idempotent under Structured Streaming's at-least-once foreachBatch
    replay when ``batch_id`` is passed: the applied batch id travels
    INSIDE the staging directory, so the data merge and the replay
    marker always commit together — a redelivered batch is skipped
    instead of double-adding its ``n_dups``. (That guarantee is about
    marker/data PAIRING, not whole-swap atomicity: the swap itself is
    two renames, and :func:`_recover_swap` heals the window between
    them on the next call, so accumulated state survives a crash at
    any point.)"""
    _recover_swap(table_path)
    if batch_id is not None and batch_id <= _applied_batch(table_path):
        return
    spark = batch_df.sparkSession
    keep_cols = [id_col, *carry_cols]
    new = (
        batch_df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min_by(F.struct(*keep_cols), F.col(id_col)).alias("keep"),
            F.count("*").alias("n_dups"),
        )
        .select("text_hash", "keep.*", "n_dups")
    )
    if _table_exists(table_path):
        old = spark.read.parquet(table_path)
        merged = (
            old.alias("o")
            .join(new.alias("n"), "text_hash", "full_outer")
            .select(
                "text_hash",
                *[
                    F.coalesce(F.col(f"o.{c}"), F.col(f"n.{c}")).alias(c)
                    for c in keep_cols
                ],
                (
                    F.coalesce(F.col("o.n_dups"), F.lit(0))
                    + F.coalesce(F.col("n.n_dups"), F.lit(0))
                ).alias("n_dups"),
            )
        )
    else:
        merged = new
    # staging write materializes the merge (which still reads the old
    # directory) BEFORE the old directory is replaced
    staging = table_path + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    merged.write.parquet(staging)
    if batch_id is not None:
        with open(os.path.join(staging, "_applied_batch"), "w") as f:
            f.write(str(int(batch_id)))
    # two-rename swap: the accumulated table is only ever ASIDE (not
    # deleted) until the new copy is in place, so a crash at any
    # point leaves a recoverable state (see _recover_swap)
    old = table_path + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(table_path):
        os.rename(table_path, old)
    os.rename(staging, table_path)
    if os.path.exists(old):
        shutil.rmtree(old)


def incremental_dedup_apply(
    docs: DataFrame,
    table_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
):
    """Start the maintenance query; returns the StreamingQuery.

    ``docs`` is the RAW document stream (not pre-deduped): the sink
    aggregates each micro-batch itself so duplicate counts inside a
    batch are captured — feeding it through ``exact_dedup_stream``
    first would lose the per-group sizes.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_dedup_groups(
            batch_df, table_path, text_col, id_col, carry_cols, batch_id=batch_id
        )

    return docs.writeStream.outputMode("append").foreachBatch(_sink).start()


def read_kept(spark: SparkSession, table_path: str) -> DataFrame:
    """The maintained kept corpus: (text_hash, keeper cols..., n_dups)."""
    _recover_swap(table_path)
    return spark.read.parquet(table_path)

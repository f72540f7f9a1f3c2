"""Incremental distribution-drift monitoring — the streaming twin of
q134.

A live pipeline wants the drift alarm to update as events land, not
once per backfill: after every micro-batch, the total-variation
distance between the cumulative BASELINE window (events before the
cutoff) and the cumulative CURRENT window (events at/after it), in
the same exact integer space as batch q134. State under
``foreachBatch``:

- ``counts/`` — cumulative per-category (n_first, n_second) counts
  (category-cardinality: a handful of rows, replaced wholesale per
  batch; the applied-batch marker commits atomically WITH the fold
  via the backend's meta, the mixture-stream contract, so a replayed
  batch can never double-count).
- ``report/`` — one appended drift report per batch:
  ``(batch_id, event_type, n_first, n_second, delta_ppm, tv_ppm)``
  — exactly q134's row shape plus provenance. After the final batch
  of an in-order replay the latest report EQUALS batch q134
  row-for-row (pinned in tests/test_streaming_drift.py); earlier
  reports are the drift trajectory a monitor would alert on.

The TV arithmetic is the q134 kernel verbatim-by-construction: bigint
cross products in DECIMAL(38,0), integer-ppm division, no float fold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._state import DEFAULT_BACKEND, ParquetStateBackend


def _counts_path(state_dir: str) -> str:
    return os.path.join(state_dir, "counts")


def _report_path(state_dir: str) -> str:
    return os.path.join(state_dir, "report")


def _applied_batch(counts_path: str, backend: ParquetStateBackend) -> int:
    meta = backend.read_meta(counts_path)
    return -1 if meta is None else int(meta.get("applied_batch", -1))


def merge_drift_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    cutoff: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    backend: ParquetStateBackend | None = None,
) -> None:
    """Fold one micro-batch's per-category window counts into state
    and append the post-fold drift report. Replace-fold + meta-marker
    (atomic pair) means a redelivered batch is a no-op and a replay
    can never double-count; a crash between the fold and the report
    append only costs that batch's REPORT row, which the next batch's
    cumulative report supersedes (reports are monotone snapshots, not
    deltas)."""
    backend = backend or DEFAULT_BACKEND
    counts_path = _counts_path(state_dir)
    if batch_id <= _applied_batch(counts_path, backend):
        return
    spark = batch_df.sparkSession
    from ..operators.drift import window_counts

    batch_counts = window_counts(batch_df, cutoff, type_col, ts_col)
    prev = backend.read(spark, counts_path)
    if prev is not None:
        merged = (
            prev.unionByName(batch_counts)
            .groupBy("event_type")
            .agg(
                F.sum("n_first").alias("n_first"),
                F.sum("n_second").alias("n_second"),
            )
        )
    else:
        merged = batch_counts
    backend.replace(merged, counts_path, meta={"applied_batch": int(batch_id)})
    folded = backend.read(spark, counts_path)
    from ..operators.drift import tv_report

    report = tv_report(folded).withColumn(
        "batch_id", F.lit(int(batch_id)).cast("bigint")
    )
    backend.append(report.coalesce(1), _report_path(state_dir), None)


def read_drift(spark: SparkSession, state_dir: str, backend=None) -> DataFrame:
    """The LATEST cumulative drift report (max batch_id; duplicate
    appends from a replay are identical rows, dropped per category)."""
    backend = backend or DEFAULT_BACKEND
    rep = backend.read(spark, _report_path(state_dir))
    if rep is None:
        raise ValueError(f"no drift state at {state_dir}")
    last = rep.agg(F.max("batch_id")).collect()[0][0]
    return (
        rep.filter(F.col("batch_id") == last)
        .dropDuplicates(["event_type"])
        .select("event_type", "n_first", "n_second", "delta_ppm", "tv_ppm")
    )


def drift_trajectory(spark: SparkSession, state_dir: str, backend=None) -> DataFrame:
    """One (batch_id, tv_ppm) row per applied batch — the alarm
    trajectory a monitor plots/thresholds."""
    backend = backend or DEFAULT_BACKEND
    rep = backend.read(spark, _report_path(state_dir))
    if rep is None:
        raise ValueError(f"no drift state at {state_dir}")
    return rep.select("batch_id", "tv_ppm").dropDuplicates(["batch_id"])


def incremental_drift(
    events: DataFrame,
    state_dir: str,
    cutoff: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    backend=None,
    checkpoint: str | None = None,
):
    """Start the drift-monitoring query; returns the StreamingQuery.

    Restart contract (the scd2/gapfill ``require_restart_checkpoint``
    class): the applied-batch marker lives in the counts meta and is
    correct only while batch ids keep increasing. An uncheckpointed
    restart resets batch ids to 0, so every batch ≤ the stale marker
    would be silently skipped — events lost from the cumulative counts
    with no error. Refuse it; a fresh state dir or a checkpoint is
    required.
    """
    if checkpoint is None and _applied_batch(
        _counts_path(state_dir), backend or DEFAULT_BACKEND
    ) >= 0:
        raise ValueError(
            f"state dir {state_dir!r} holds a previous run's applied-batch "
            "marker (counts meta); restarting without a checkpoint would "
            "reset batch ids to 0 and silently skip every batch the marker "
            "already covers — pass checkpoint= (resumes source offsets) or "
            "use a fresh state dir"
        )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_drift_batch(
            batch_df, batch_id, state_dir, cutoff, type_col, ts_col, backend
        )

    w = events.writeStream.outputMode("append").foreachBatch(_sink)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()

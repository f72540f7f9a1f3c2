"""Sessionization: split a keyed event stream into sessions separated
by inactivity gaps > ``gap_s`` seconds.

Batch: the classic lag + cumulative-sum-of-boundaries plan — two
window functions over the same (key, order) partitioning, so Catalyst
plans ONE sort+exchange reused by both. Streaming:
``session_window(ts, gap)`` is native in Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key ``session_seq`` (1-based) to every event."""
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > int(gap_s * 1_000_000)),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("__new", is_new).withColumn(
        "session_seq", F.sum("__new").over(wsum)
    ).drop("__new")


def session_stats(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_s: float,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session summary: n_events, start/end epoch millis, duration."""
    s = sessionize(events, key_cols, ts_col, gap_s, order_tiebreak)
    return s.groupBy(*key_cols, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.unix_millis(F.min(ts_col)).alias("start_ms"),
        F.unix_millis(F.max(ts_col)).alias("end_ms"),
        (F.unix_millis(F.max(ts_col)) - F.unix_millis(F.min(ts_col))).alias("duration_ms"),
    )

"""Conditional compute-spread for bytes-light, CPU-dense stages.

Text/pair/media kernels have tiny input bytes but heavy per-row work;
a single small parquet file would pin the whole stage to one task, so
the round-5 operators round-robin-repartitioned unconditionally. That
is correct locally but wrong at scale: at 100 TB the scan's input
splits already parallelize, the extra Exchange is a full-corpus
shuffle for nothing, and — the round-6 q60 lesson (SCALING.md) — a
repartition between the scan and a filter blocks predicate pushdown.

:func:`spread` therefore repartitions ONLY when the input's planned
partition count is below the session's parallelism floor: the small
local file still fans out to every core, while an input that already
has enough splits passes through with ZERO added Exchange (pinned by
a plan test in tests/test_plans.py). Results are required to be
partitioning-invariant by every caller (per-row expressions /
commutative aggregations), so the conditional changes no answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, floor: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism IFF its planned partition count is below ``floor``
    (default: the parallelism itself). The partition-count probe
    compiles the physical plan but runs no job. A STREAMING frame
    cannot be probed (``.rdd`` is illegal on unstarted streams) —
    there each micro-batch is its own small frame, so the
    unconditional repartition is both required and cheap."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming:
        floor = n if floor is None else floor
        if df.rdd.getNumPartitions() >= floor:
            return df
    return df.repartition(n)

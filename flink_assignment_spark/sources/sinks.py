"""Batch and streaming sinks.

The reference's only sink is ``print()`` (``FlinkAssignment.scala:47``).
Spark-side equivalents plus the production sinks a pipeline needs:
partitioned parquet for batch, console/memory/foreachBatch for
streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink — ``partition_by`` becomes directory
    partition pruning for every downstream reader."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def print_sink(df: DataFrame, n: int = 20) -> None:
    """Reference S4: the stdout sink (batch)."""
    df.show(n, truncate=False)


def console_stream(df, mode: str = "append"):
    """Reference S4 for streams: writeStream console sink (returns the
    started query; caller manages lifecycle)."""
    return df.writeStream.outputMode(mode).format("console").start()

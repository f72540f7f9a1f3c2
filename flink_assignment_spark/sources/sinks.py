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


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles ONCE at write time so
    every later equi-join/aggregation on ``bucket_cols`` reads
    co-located data and plans with ZERO exchanges. This is the 100 TB
    answer to a fact-fact join that would otherwise shuffle both
    sides on every query (e.g. lineitem x orders on orderkey —
    bucket both by the key at ingest, join for free afterwards).

    ``sort_cols`` additionally sorts within each bucket file so
    sort-merge joins skip their Sort step too.
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def print_sink(df: DataFrame, n: int = 20) -> None:
    """Reference S4: the stdout sink (batch)."""
    df.show(n, truncate=False)


def console_stream(df, mode: str = "append"):
    """Reference S4 for streams: writeStream console sink (returns the
    started query; caller manages lifecycle)."""
    return df.writeStream.outputMode(mode).format("console").start()


def incremental_rollup_sink(
    agg_stream: DataFrame,
    path: str,
    group_partition_cols: list[str],
    checkpoint: str,
):
    """Continuous-aggregate sink (the streaming half of the
    hierarchical-rollup pattern, cf. q46): an update-mode streaming
    aggregation lands in a parquet table via foreachBatch, each
    micro-batch overwriting ONLY the partitions of the groups it
    refreshed (dynamic partition overwrite).

    ``group_partition_cols`` MUST be the aggregation's full grouping
    key: each directory partition then holds exactly one group's row,
    so overwriting the refreshed partitions upserts those groups and
    cannot drop unchanged neighbors. Replaying a micro-batch after a
    failure rewrites the same partitions with the same content —
    idempotent, so the table stays exactly-once end-to-end while the
    raw stream stays append-only.

    Pass a WATERMARKED aggregation (``withWatermark`` upstream of the
    groupBy) in production: update mode otherwise keeps every group's
    state forever, which is unbounded when grouping by event time.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        batch_df.write.mode("overwrite").partitionBy(*group_partition_cols).parquet(path)

    return (
        agg_stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(write_batch)
        .start()
    )

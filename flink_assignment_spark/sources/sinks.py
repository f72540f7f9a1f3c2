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


# value-preserving defaults per format: CSV needs a header (else the
# reader invents _c0 names) and a zone-stable timestamp format (the
# default round-trips through the session timezone); JSON likewise
# for timestamps. ORC/parquet are self-describing.
_FORMAT_WRITE_OPTS: dict[str, dict[str, str]] = {
    "csv": {
        "header": "true",
        "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    },
    "json": {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
    "orc": {},
    "parquet": {},
}


def write_format(
    df: DataFrame,
    path: str,
    fmt: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options: str,
) -> None:
    """Generic batch sink over Spark's built-in columnar/text formats
    (``parquet`` / ``orc`` / ``json`` / ``csv``) with value-preserving
    defaults — one engine, many storage formats, same plan. CSV/JSON
    carry no type metadata, so readers should pass the schema back
    (see ``loaders.read_format``)."""
    if fmt not in _FORMAT_WRITE_OPTS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMAT_WRITE_OPTS)}")
    w = df.write.mode(mode).format(fmt).options(**{**_FORMAT_WRITE_OPTS[fmt], **options})
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


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


def ensure_bucketed_table(
    spark,
    table: str,
    key: str,
    cols_ddl: str,
    n_buckets: int,
    build,
    lock_timeout_s: float = 600.0,
) -> None:
    """Idempotently materialize ``build()`` as a bucketed+sorted table.

    The ingest-once contract behind :func:`write_bucketed`: the first
    caller pays the hash shuffle and writes bucket files; every later
    SESSION finds the files (``_SUCCESS``) and re-attaches them as an
    external table without touching the data; every later call in the
    same catalog is a no-op (``tableExists``).

    SIDE-EFFECT CONTRACT — this function mutates shared warehouse
    state (CREATE TABLE + directory writes + removal of half-written
    leftovers). Callers embedding it inside a "query" function (q56)
    accept that building the query may write. Concurrency: when the
    warehouse is on the local filesystem, an exclusive ``.lock`` file
    beside the table directory serializes writers (create/attach/rmtree
    all happen under the lock), so two sessions racing on the same
    fingerprinted name cannot interleave. For object-store warehouses
    (no atomic O_EXCL) the caller must guarantee a single writer per
    table name — at cluster scale that is the ingest job's scheduler,
    not a query-time race.

    ``cols_ddl`` must match ``build()``'s schema; the bucket count is
    assumed to be baked into ``table`` (attach trusts the layout).
    """
    import os
    import shutil
    import time
    from urllib.parse import urlparse

    if spark.catalog.tableExists(table):
        return

    def _local_location() -> str | None:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
        if wh.scheme in ("", "file"):
            return os.path.join(wh.path, table.lower())
        return None

    def _ensure() -> None:
        if spark.catalog.tableExists(table):
            return
        loc = _local_location()
        if loc is not None and os.path.exists(os.path.join(loc, "_SUCCESS")):
            spark.sql(
                f"CREATE TABLE {table} ({cols_ddl}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {n_buckets} BUCKETS LOCATION '{loc}'"
            )
            return
        if loc is not None:
            # half-written leftovers block saveAsTable (LOCATION_ALREADY_EXISTS)
            shutil.rmtree(loc, ignore_errors=True)
        from pyspark.sql import functions as F

        write_bucketed(
            build().repartition(n_buckets, F.col(key)),
            table,
            [key],
            n_buckets,
            sort_cols=[key],
        )

    loc = _local_location()
    if loc is None:
        _ensure()
        return
    os.makedirs(os.path.dirname(loc), exist_ok=True)
    lock = loc + ".lock"
    deadline = time.monotonic() + lock_timeout_s
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"{lock} held for >{lock_timeout_s}s — remove it if its "
                    "writer crashed (the lock is only valid while a writer runs)"
                )
            time.sleep(0.2)
            continue
        try:
            _ensure()
        finally:
            os.close(fd)
            os.unlink(lock)
        return

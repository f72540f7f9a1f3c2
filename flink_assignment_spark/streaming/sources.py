"""Streaming sources.

The reference replays bounded files through Flink's streaming runtime
(``FlinkAssignment.scala:37,43``). The Structured Streaming analogue
is a file-directory source with an explicit schema: same DataFrame
transformations as batch, executed incrementally per micro-batch —
the core design point of Structured Streaming (one API, two runners).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import COMMIT, COMMIT_GEO, EVENTS


def read_commits_stream(spark: SparkSession, path: str, max_files: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(COMMIT)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.json(path)


def read_commit_geo_stream(spark: SparkSession, path: str, max_files: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(COMMIT_GEO)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.json(path)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """Events table as a stream (parquet dir). ``ts`` is nanos in the
    driver-generated files; the batch loader handles that — for
    streaming tests we expect files rewritten at µs precision."""
    return spark.readStream.schema(EVENTS).parquet(path)

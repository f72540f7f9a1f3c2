"""Batch sources.

Replaces the reference's source stack — ``env.readTextFile`` +
``map(new CommitParser)`` (reference ``FlinkAssignment.scala:37-38,
43-44``; ``util/CommitParser.scala:13-22``) — with Spark's native
schema-on-read JSON/parquet sources. Benefits at scale: the JSON
parser runs JVM-side with column pruning (only referenced nested
fields are parsed), and parquet scans get predicate pushdown +
row-group pruning for free from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ALL_TABLES, COMMIT, COMMIT_GEO


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table, e.g. ``load_table(spark, sf, "lineitem")``.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark
    rejects natively; read it as raw nanos (``nanosAsLong``) and
    truncate to microseconds — exactly what DuckDB does when it scans
    the same file, so the oracle sees identical instants.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> None:
    """Register every synthetic table as a temp view for spark.sql use."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def read_commits_json(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited JSON of GitHub commit events → typed DataFrame.

    Replaces reference S1+S2 (``FlinkAssignment.scala:37-38``): the
    explicit schema makes malformed/missing fields null (matching the
    reference's ``Option`` semantics) and enables nested-field pruning.
    """
    return spark.read.schema(COMMIT).json(path)


def read_commit_geo_json(spark: SparkSession, path: str) -> DataFrame:
    """Reference S3 (``FlinkAssignment.scala:43-44``)."""
    return spark.read.schema(COMMIT_GEO).json(path)

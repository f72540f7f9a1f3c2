"""Salted aggregation equivalence + sink round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.skew import salted_agg
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.sources.sinks import write_parquet

from .conftest import SF_DIR


def test_salted_agg_equals_plain(spark):
    """Salted two-phase aggregation returns exactly the plain groupBy
    result (the salt only changes the shuffle layout) — including on a
    synthetically skewed input where one key holds ~90% of rows."""
    ev = load_table(spark, SF_DIR, "events")
    skewed = ev.withColumn(
        "key", F.when(F.col("event_id") % 10 != 0, "HOT").otherwise(F.col("event_type"))
    )
    plain = {
        (r.key, r.cnt, round(r.sum_value, 6))
        for r in skewed.groupBy("key")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sum_value"))
        .collect()
    }
    salted = {
        (r.key, r.cnt, round(r.sum_value, 6))
        for r in salted_agg(skewed, ["key"], ["value"]).collect()
    }
    assert salted == plain


def test_salted_agg_spreads_hot_key(spark):
    """The partial stage must split the hot key into multiple cells."""
    ev = load_table(spark, SF_DIR, "events").withColumn("key", F.lit("HOT"))
    partial_cells = (
        ev.select("key", (F.rand(42) * 16).cast("int").alias("__salt"))
        .groupBy("key", "__salt")
        .count()
        .count()
    )
    assert partial_cells > 1


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    out = str(tmp_path / "out")
    write_parquet(ev, out, partition_by=["event_type"])
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    # partition pruning: a filter on the partition column reads only
    # that directory
    one = back.filter(F.col("event_type") == "click")
    assert one.count() == ev.filter(F.col("event_type") == "click").count()

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


def test_bucketed_join_zero_shuffle(spark, tmp_path):
    """write_bucketed pre-shuffles at write time: a later
    lineitem x orders equi-join on the bucket key plans with ZERO
    shuffle exchanges (both scans are bucketed on l_orderkey /
    o_orderkey with the same bucket count). This is the ingest-time
    answer to a repeated fact-fact join at 100 TB."""
    import re

    from flink_assignment_spark.plans.inspect import physical_plan
    from flink_assignment_spark.sources.loaders import load_table
    from flink_assignment_spark.sources.sinks import write_bucketed

    from .conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test tables would broadcast; disable so the plan shows the
        # co-located path a 100 TB fact-fact join would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(li, "t_li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
        write_bucketed(o, "t_o_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
        joined = (
            spark.table("t_li_bucketed")
            .join(
                spark.table("t_o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_custkey")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = physical_plan(joined)
        # the join itself must not shuffle either side; the only
        # allowed exchange is the final groupBy on o_custkey
        joins = re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)
        assert joins, plan  # it IS a co-located equi join, not broadcast
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges <= 1, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """write_parquet(partition_by=...) must give downstream readers
    directory partition pruning: a filter on the partition column
    shows up as PartitionFilters on the scan and prunes the unread
    directories — at 100 TB this is the difference between scanning
    one day and scanning the lake."""
    import re

    from flink_assignment_spark.plans.inspect import physical_plan

    out = str(tmp_path / "by_type")
    events = load_table(spark, SF_DIR, "events").select("event_id", "event_type", "value")
    write_parquet(events, out, partition_by=["event_type"])

    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = physical_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    assert df.count() == events.filter(F.col("event_type") == "click").count()


def test_salted_join_equals_plain_join(spark):
    """salted_join must return exactly the plain join's rows, with a
    planted hot key (half the left side on one key)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from flink_assignment_spark.operators.skew import salted_join

    left = spark.range(2000).select(
        F.when(F.col("id") < 1000, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    got = Counter((r.k, r.lv, r.rv) for r in salted_join(left, right, ["k"]).collect())
    want = Counter((r.k, r.lv, r.rv) for r in left.join(right, "k").collect())
    assert len(got) > 0 and got == want


def test_salted_join_survives_caller_salt_column(spark):
    """Inputs already carrying a ``__salt`` column must join correctly
    (the working column is renamed, not clobbered) and keep the
    caller's column intact."""
    from collections import Counter

    from pyspark.sql import functions as F

    from flink_assignment_spark.operators.skew import salted_agg, salted_join

    left = spark.range(200).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("lv"), F.lit(99).alias("__salt")
    )
    right = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv"), F.lit(-1).alias("__salt")
    )
    joined = salted_join(left, right.drop("__salt"), ["k"])
    got = Counter((r.k, r.lv, r.rv, r["__salt"]) for r in joined.collect())
    want = Counter(
        (r.k, r.lv, r.rv, r["__salt"]) for r in left.join(right.drop("__salt"), "k").collect()
    )
    assert len(got) == 200 and got == want

    agg = {r.k: r.cnt for r in salted_agg(left, ["k"], []).collect()}
    assert agg == {k: 20 for k in range(10)}


def test_ensure_bucketed_table_respects_writer_lock(spark):
    """A held .lock beside the table location must block (then time
    out) rather than letting a second writer interleave with the
    create/attach/cleanup sequence."""
    import os
    from urllib.parse import urlparse

    import pytest

    from flink_assignment_spark.sources.sinks import ensure_bucketed_table

    table = "lock_probe_tbl"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    os.makedirs(wh, exist_ok=True)
    lock = os.path.join(wh, table.lower()) + ".lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
        with pytest.raises(TimeoutError, match="writer crashed"):
            ensure_bucketed_table(
                spark, table, "id", "id BIGINT", 4,
                lambda: spark.range(10), lock_timeout_s=1.0,
            )
        assert not spark.catalog.tableExists(table)
    finally:
        os.close(fd)
        os.unlink(lock)
    # lock released → the same call succeeds and is idempotent
    ensure_bucketed_table(spark, table, "id", "id BIGINT", 4, lambda: spark.range(10))
    ensure_bucketed_table(spark, table, "id", "id BIGINT", 4, lambda: spark.range(10))
    assert spark.table(table).count() == 10
    spark.sql(f"DROP TABLE {table}")

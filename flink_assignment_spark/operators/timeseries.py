"""Time-series shaping operators: dense-spine gap fill with LOCF, and
SCD Type-2 validity-interval builds from a changelog.

Both are pure Catalyst plans — windows over one exchange on the key,
plus (for gap fill) a ``sequence``/``explode`` spine that is narrow
after the per-key bounds aggregate. No UDFs, no driver-side loops.

100 TB shape: everything shuffles exactly once on the entity key; the
spine explosion is bounded by the observation span per key (the
hypertable/continuous-aggregate pattern would persist the hourly layer
and gap-fill over it, reading ~1/3600th of raw volume — see q46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key time buckets between each key's first and last
    observation, missing buckets filled by last-observation-carried-
    forward (the TimescaleDB ``time_bucket_gapfill`` + ``locf``
    semantics).

    Per (key, bucket) the LAST observation wins (max ``ts_col``, ties
    broken by max ``tie_col``). Output: (key, bucket_ts, filled_value,
    is_observed). The first bucket of every key is observed by
    construction, so ``filled_value`` is never null. The carried value
    is the raw column — no arithmetic — so results are bit-exact.
    """
    iv = {"hour": "interval 1 hour", "day": "interval 1 day"}[bucket]
    obs = (
        events.select(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
            F.col(ts_col).alias("__ts"),
            F.col(tie_col).alias("__tie"),
            F.col(value_col).alias("value"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("key", "bucket_ts").orderBy(
                    F.desc("__ts"), F.desc("__tie")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select("key", "bucket_ts", "value")
    )
    bounds = obs.groupBy("key").agg(
        F.min("bucket_ts").alias("h0"), F.max("bucket_ts").alias("h1")
    )
    spine = bounds.select(
        "key",
        F.explode(F.sequence("h0", "h1", F.expr(iv))).alias("bucket_ts"),
    )
    joined = spine.join(obs, ["key", "bucket_ts"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "key",
        "bucket_ts",
        F.last("value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("value").isNotNull().cast("int").alias("is_observed"),
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 build from a changelog: per
    key, collapse consecutive runs of the same ``attr_col`` value into
    validity intervals [valid_from, valid_to) — ``valid_to`` is the
    next run's start (null on the current row).

    Output: (key, state, valid_from, valid_to, version, is_current).
    Two window passes over ONE exchange on the key (lag for change
    detection, then lead/row_number over the run starts); Catalyst
    reuses the sort. This is the interval-build complement of the
    latest-per-key compaction (q48) and the two-snapshot diff (q70).
    """
    ordw = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tie_col))
    # change detection must be NULL-SAFE: a changelog transition to a
    # NULL attribute value must open a new (NULL-state) interval, not
    # be absorbed into the prior run. lag(attr) is NULL both on the
    # first row and after a NULL value, so first-row detection rides a
    # separate lag over a constant.
    runs = (
        events.withColumn("__prev", F.lag(attr_col).over(ordw))
        .withColumn("__first", F.lag(F.lit(1)).over(ordw).isNull())
        .filter(
            F.col("__first") | ~F.col("__prev").eqNullSafe(F.col(attr_col))
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(attr_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.col(tie_col).alias("__tie"),
        )
    )
    # two runs of one key can start at the same timestamp (two events,
    # same ts, different attr values) — the tie column keeps the
    # interval chain deterministic
    runw = Window.partitionBy("key").orderBy(F.asc("valid_from"), F.asc("__tie"))
    return runs.select(
        "key",
        "state",
        "valid_from",
        F.lead("valid_from").over(runw).alias("valid_to"),
        F.row_number().over(runw).cast("int").alias("version"),
        F.lead("valid_from").over(runw).isNull().cast("int").alias("is_current"),
    )

"""SparkSession factory.

The reference runs single-threaded event-time streaming
(``FlinkAssignment.scala:31-32``). Our engine targets a real cluster;
locally we run ``local[N]`` but keep every setting cluster-shaped:

- ``spark.sql.session.timeZone=UTC`` — the reference formats window
  starts with the JVM default timezone (``FlinkAssignment.scala:130``);
  we pin UTC so epoch-aligned windows and ``date_format`` agree with
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
- AQE on — runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast decisions; this is what lets the
  same plan survive sf0.001 → 100 TB.
- Arrow on — every Pandas-UDF path (multimodal, stateful CEP) moves
  data in Arrow batches, not pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flink_assignment_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    ``shuffle_partitions`` defaults to the core count locally; on a
    real cluster set it to ~2-3x total executor cores (AQE coalesces
    the excess, so erring high is safe).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescePartitions.parallelismFirst stays at its default
        # (true). The r17 round MEASURED the Spark-docs-recommended
        # `false` (+ explicit 64m advisory) against this tree with the
        # paired A/B harness and REJECTED it: size-based coalescing
        # serializes compute-DENSE, byte-LIGHT stages — the fuzzy-
        # linkage variant join went 4.5x slower (q125 med 2.0 s -> 9.0 s
        # DISJOINT), the shingle posting self-join 1.6-1.8x (q15/q94/
        # q117), blocking joins 1.5x (q107/q121) — while none of the
        # window/sketch rows it was meant to rescue improved beyond
        # noise (q92/q95/q104/q110/q118 med-ratio 0.95-1.04 OVERLAP).
        # Bytes are the only statistic AQE can see, and for these
        # kernels CPU-per-row, not bytes, is the cost; details in
        # OPTIMIZATION_r17.md ("AQE coalescing below parallelism").
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE replace a planned sort-merge join with a shuffled hash
        # join at runtime when the build side's per-partition map fits
        # this budget. Gated on OBSERVED shuffle sizes, so it cannot OOM
        # the way a static preferSortMergeJoin=false could; removes both
        # sorts from mid-size joins that outgrow the broadcast threshold
        # (measured on the q08 band join at 10M rows: ~2.3s -> ~1.1s).
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Pin the settings the DuckDB-oracle comparison depends on, on a
    session we did not create (the driver owns its own session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark

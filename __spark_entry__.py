"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
LLM-pipeline extensions), each (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent SQL per query, same column
names/arithmetic so the driver's value-hash compare is exact.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_assignment_spark.queries.synthetic import REGISTRY
from flink_assignment_spark.session import configure_for_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    configure_for_oracle(spark)
    return REGISTRY["q07_daily_summary_having"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_for_oracle(spark)  # pin UTC on the driver's session
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.spark) for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}

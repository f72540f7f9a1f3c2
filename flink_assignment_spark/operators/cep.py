"""Complex-event-processing substitute: A followed-by B within T.

The reference uses Flink CEP
``begin("added").followedBy("removed").within(Time.days(1))`` keyed
by (repo, filename) (reference ``FlinkAssignment.scala:332-347``).
Flink ``followedBy`` is relaxed-contiguity with no-skip: every A
event opens a partial match that completes with the FIRST subsequent
B within the window.

Batch form (here): band self-join A×B + ``min(b_ts)`` per A event —
pure Catalyst, shuffles on the key, no state. Streaming form:
``applyInPandasWithState`` in ``streaming/cep_stream.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def followed_by(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    type_col: str,
    first_type: str,
    second_type: str,
    within_s: float,
    strict_after: bool = True,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Match (A, first B after A) per key within ``within_s`` seconds.

    Returns one row per matched A event: key columns + ``carry_cols``
    (extra columns carried from the A event, e.g. its id) +
    ``first_ts`` (A's timestamp) + ``second_ts`` (min B timestamp in
    (first_ts, first_ts + within]).
    """
    carry_cols = carry_cols or []
    a = events.filter(F.col(type_col) == first_type).select(
        *key_cols, *carry_cols, F.col(ts_col).alias("first_ts")
    )
    b = events.filter(F.col(type_col) == second_type).select(
        *key_cols, F.col(ts_col).alias("second_ts")
    )
    lower = F.col("second_ts") > F.col("first_ts") if strict_after else (
        F.col("second_ts") >= F.col("first_ts")
    )
    cond = lower & (
        F.col("second_ts") <= F.col("first_ts") + F.expr(f"INTERVAL '{within_s}' SECOND")
    )
    return (
        a.join(b, key_cols)
        .filter(cond)
        .groupBy(*key_cols, *carry_cols, "first_ts")
        .agg(F.min("second_ts").alias("second_ts"))
    )

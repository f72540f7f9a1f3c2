"""Batch multi-step funnel (chained first-match CEP).

Generalizes the reference's 2-step ``followedBy-within`` CEP
(``FlinkAssignment.scala:332-347``) to N ordered steps: step 1 is each
key's MIN-ts event of the first type; step k is the MIN-ts event of
its type strictly after step k-1 and within ``step_horizon_s`` of it.
One row per key that completes every step.

Execution shape (the 100 TB argument): each stage is one keyed
aggregation or one equi-join + min-aggregation on the SAME key, so
every shuffle reuses the key's hash partitioning stage to stage — no
window-free self-joins, no row explosion; intermediate cardinality is
bounded by the number of keys still alive in the funnel, which only
shrinks stage to stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    step_horizon_s: float,
) -> DataFrame:
    """(key, <step>_ts ...) for keys completing all steps in order."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    # microsecond precision — int(s) SECOND would silently truncate a
    # fractional horizon to 0 while the streaming twin honors it
    gap = F.expr(f"INTERVAL '{int(step_horizon_s * 1_000_000)}' MICROSECOND")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias(f"{steps[0]}_ts"))
    )
    for i in range(1, len(steps)):
        prev_ts = F.col(f"{steps[i - 1]}_ts")
        carried = [key_col] + [f"{s}_ts" for s in steps[:i]]
        cur = (
            events.filter(F.col(type_col) == steps[i])
            .join(cur, key_col)
            .filter((F.col(ts_col) > prev_ts) & (F.col(ts_col) <= prev_ts + gap))
            .groupBy(*carried)
            .agg(F.min(ts_col).alias(f"{steps[i]}_ts"))
        )
    return cur

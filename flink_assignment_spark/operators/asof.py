"""As-of join: for each left row, the single latest right row with
``right_ts <= left_ts``, per key.

Scope note: the reference engine's only temporal join is the interval
join (``FlinkAssignment.scala:274-287``, SURVEY §2.5 J1); as-of is a
training-pipeline extension (feature lookup "state as of event time",
last-touch attribution, slowly-changing-dimension resolution).

Scale design — why not a range join: the naive formulation
(``l JOIN r ON key AND r.ts <= l.ts`` then argmax per left row)
materializes every (left, right) pair below the timestamp before
discarding all but one — quadratic in per-key row count, ruinous at
100 TB. This implementation is the union + running-last-value
pattern:

1. tag left rows side=1, right rows side=0, union them;
2. one sort-based exchange per key, ordered ``(ts, side, tie)`` —
   right rows sort before left rows at equal ``ts`` so the bound is
   inclusive, and ``tie`` ascending makes the pick deterministic
   among right rows sharing a timestamp (last = max tie);
3. ``last(right_payload, ignorenulls=True)`` over rows unbounded
   preceding → current row carries the latest right row forward.

Total cost: ONE shuffle of |L|+|R| rows and a linear scan per
partition — the same plan shape as a window aggregate, no pair
blow-up. Skewed keys can be pre-split upstream; AQE handles moderate
skew in the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tie_break: str | None = None,
    how: str = "inner",
    prefix: str = "asof_",
) -> DataFrame:
    """Match each left row with the latest right row at-or-before it.

    ``on`` columns must exist on both sides (rename upstream). Right
    payload columns (everything except ``on``) come back prefixed with
    ``prefix``. ``tie_break`` names a right column whose maximum wins
    among right rows sharing the same key and timestamp (required for
    a deterministic result when such ties exist). ``how`` is
    ``"inner"`` (drop unmatched left rows) or ``"left"`` (keep, with
    null payload).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    rpay_cols = [c for c in right.columns if c not in on]
    rpay_t = right.select(F.struct(*rpay_cols).alias("s")).schema[0].dataType
    if tie_break is not None:
        tie, tie_t = F.col(tie_break), right.schema[tie_break].dataType
    else:
        tie, tie_t = F.lit(0), "int"

    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        tie.alias("_tie"),
        F.lit(0).alias("_side"),
        F.struct(*rpay_cols).alias("_rpay"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema[0].dataType
        ).alias("_lpay"),
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(tie_t).alias("_tie"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rpay_t).alias("_rpay"),
        F.struct(*left.columns).alias("_lpay"),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("_m", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    if how == "inner":
        matched = matched.filter(F.col("_m").isNotNull())
    return matched.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(f"{prefix}{c}") for c in rpay_cols],
    )

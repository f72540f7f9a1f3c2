"""Distribution-drift metrics in exact integer space.

Total variation is the drift metric that admits an exact cross-engine
oracle: |n1/N1 - n2/N2| cross-multiplies to |n1*N2 - n2*N1| / (N1*N2),
so every intermediate is an integer (order-free sums, no float fold)
and the published figures are integer ppm. PSI/KL need ln(), which is
not exactly rounded cross-engine. Quadratic terms run in
DECIMAL(38,0) (DuckDB: HUGEINT) — the q69 discipline; cross products
overflow int64 near ~3e9 rows per window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tv_report(counts: DataFrame) -> DataFrame:
    """The exact-integer total-variation projection over a
    ``(event_type, n_first, n_second)`` category-count frame:
    per-category share delta and the corpus TV distance, both in
    integer ppm. One tiny window over the category-cardinality frame
    — shared verbatim by batch q134 and the streaming monitor
    (streaming/drift_stream.py), so their reports agree by
    construction."""
    dec = "decimal(38,0)"
    w = Window.partitionBy()
    d = (
        counts.withColumn("t1", F.sum("n_first").over(w).cast(dec))
        .withColumn("t2", F.sum("n_second").over(w).cast(dec))
        .withColumn(
            "drift_num",
            F.abs(
                F.col("n_first").cast(dec) * F.col("t2")
                - F.col("n_second").cast(dec) * F.col("t1")
            ),
        )
    )
    # an EMPTY window (all events on one side of the cutoff — the
    # normal state of a streaming monitor's early batches) makes the
    # share comparison undefined: report null, not a division error
    # and not a fake 100% drift
    ok = (F.col("t1") > 0) & (F.col("t2") > 0)
    return d.select(
        "event_type",
        "n_first",
        "n_second",
        F.when(ok, F.expr("(1000000 * drift_num) div (t1 * t2)"))
        .cast("long")
        .alias("delta_ppm"),
        F.when(
            ok, F.expr("(1000000 * sum(drift_num) over ()) div (2 * t1 * t2)")
        )
        .cast("long")
        .alias("tv_ppm"),
    )


def window_counts(
    events: DataFrame,
    cutoff: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-category counts for the baseline (before ``cutoff``) and
    current (at/after) windows — ``tv_report``'s input, one groupBy."""
    cut = F.lit(cutoff).cast("timestamp")
    return events.groupBy(F.col(type_col).alias("event_type")).agg(
        F.sum((F.col(ts_col) < cut).cast("long")).alias("n_first"),
        F.sum((F.col(ts_col) >= cut).cast("long")).alias("n_second"),
    )

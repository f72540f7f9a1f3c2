"""Streaming CEP: A followed-by B within T, via
``applyInPandasWithState``.

The streaming counterpart of ``operators.cep.followed_by`` —
reproduces Flink CEP ``begin(A).followedBy(B).within(T)`` (reference
``FlinkAssignment.scala:332-347``) with keyed state: per key we hold
the open "A" timestamps (partial matches); each arriving "B" closes
every open A within the window (first-match, no-skip), emitting one
match per A. Expired A's are dropped once their window passes.

State is bounded by ``within_s`` per key — the same contract as
Flink CEP's NFA state pruning.

Input-order contract: events must arrive in event-time order ACROSS
micro-batches per key (within a batch they are sorted). This mirrors
the reference's explicit in-order assumption
(``AscendingTimestampExtractor``, reference README.md:114); for
out-of-order sources, compose ``streaming.reorder.reorder_buffer`` upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def followed_by_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    type_col: str,
    first_type: str,
    second_type: str,
    within_s: float,
) -> DataFrame:
    """Returns (key..., first_ts_us, second_ts_us) per match.

    Input must be watermarked on ``ts_col`` upstream. Timestamps are
    emitted as epoch microseconds (state arrays hold primitives).
    """
    out_fields = [StructField(k, StringType()) for k in key_cols] + [
        StructField("first_ts_us", LongType()),
        StructField("second_ts_us", LongType()),
    ]
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("open_us", StringType())])  # csv of open A μs
    within_us = int(within_s * 1_000_000)

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        open_us: list[int] = []
        if state.exists:
            (csv_val,) = state.get
            if csv_val:
                open_us = [int(x) for x in csv_val.split(",")]
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for _, r in pdf.iterrows():
                t_us = int(r[ts_col].value // 1000)  # pandas ns → µs
                if r[type_col] == first_type:
                    open_us.append(t_us)
                elif r[type_col] == second_type:
                    matched = [a for a in open_us if a < t_us <= a + within_us]
                    for a in matched:
                        rows.append(tuple(key) + (a, t_us))
                    # first-match (no-skip): each A closes at its first B
                    open_us = [a for a in open_us if a not in matched]
                # prune expired partial matches (state bound = within)
                open_us = [a for a in open_us if a + within_us >= t_us]
        state.update((",".join(str(a) for a in open_us),))
        cols = [f.name for f in out_fields]
        yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return (
        events.groupBy(*key_cols)
        .applyInPandasWithState(
            proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )

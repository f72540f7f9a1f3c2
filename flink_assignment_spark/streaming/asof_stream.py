"""Streaming as-of attribution via ``applyInPandasWithState``.

The streaming counterpart of ``q34_asof_attribution``
(``operators/asof.py``): last-touch attribution is a per-event
streaming job in production — every purchase should be attributed the
moment it arrives, not in a nightly batch re-join. Batch semantics
being reproduced: for each ``left_type`` event (purchase), the latest
``right_type`` event (view) by the same key at-or-before it, ties on
timestamp broken by max event id.

State design (the 100 TB argument): per key the state is O(1) — the
single latest right-side event ``(id, ts_us, value)``. The batch
form's union + running ``last_value`` window IS this state machine
unrolled: processing each key's events in (ts, side, id) order with
"latest view so far" as the only carried value produces exactly the
window's ``last(_rpay, ignorenulls=True)`` at every left row. Right
rows sort before left rows at equal timestamps, so the at-or-before
bound is inclusive, and ascending-id processing of same-ts right rows
leaves the max id as the survivor — both tie rules identical to
``asof_join``'s ``(_ts, _side, _tie)`` ordering.

Input-order contract: events must arrive in event-time order per key
ACROSS micro-batches (within a batch they are sorted here) — the same
in-order replay contract as the funnel/CEP/LSH streams, matching the
reference's ascending-timestamp assumption. An out-of-order view
would retroactively re-attribute already-emitted purchases, which an
append-mode stream cannot do; compose ``streaming.reorder.reorder_buffer``
upstream for out-of-order sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def asof_attribution_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
    left_type: str = "purchase",
    right_type: str = "view",
) -> DataFrame:
    """One output row per ``left_type`` event that has a matching
    at-or-before ``right_type`` event: ``(purchase_id, <key>, view_id,
    view_lag_us, view_value)`` — q34's exact schema, with
    ``view_value`` rounded JVM-side after the UDF so the HALF_UP
    semantics match the batch query bit-for-bit (Python's banker's
    rounding does not)."""
    key_type = events.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField("purchase_id", LongType()),
            StructField(key_col, key_type),
            StructField("view_id", LongType()),
            StructField("view_lag_us", LongType()),
            StructField("_raw_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("view_id", LongType()),
            StructField("view_ts_us", LongType()),
            StructField("view_value", DoubleType()),
        ]
    )

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        latest = state.get if state.exists else None  # (id, ts_us, value)
        rows = []
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks)
            pdf = pdf[pdf[type_col].isin([left_type, right_type])]
            if len(pdf):
                # right rows first at equal ts (inclusive bound), then
                # ascending id so the max-id view survives a ts tie —
                # the asof_join (_ts, _side, _tie) order verbatim
                pdf = pdf.assign(_side=(pdf[type_col] != right_type).astype(int))
                pdf = pdf.sort_values(
                    [ts_col, "_side", id_col], kind="mergesort"
                )
                for ev_id, ev_type, t, val in zip(
                    pdf[id_col], pdf[type_col], pdf[ts_col], pdf[value_col]
                ):
                    t_us = int(t.value // 1000)  # pandas ns → µs
                    if ev_type == right_type:
                        latest = (int(ev_id), t_us, float(val))
                    elif latest is not None:
                        rows.append(
                            (
                                int(ev_id),
                                *(tuple(key)),
                                latest[0],
                                t_us - latest[1],
                                latest[2],
                            )
                        )
        if latest is not None:
            state.update(tuple(latest))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    out = events.groupBy(key_col).applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    return out.select(
        "purchase_id",
        key_col,
        "view_id",
        "view_lag_us",
        F.round(F.col("_raw_value"), 2).alias("view_value"),
    )

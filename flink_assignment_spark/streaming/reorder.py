"""Watermark-bounded reorder buffer — out-of-order → in-order.

Every keyed streaming operator in this package (as-of attribution,
funnel, CEP, chunk/substring numbering, LSH folding) carries the same
contract: events arrive in event-time order per key ACROSS
micro-batches. Real sources are not that polite. This operator is the
bridge: buffer each key's events in state, release them IN EVENT-TIME
ORDER once the watermark passes them — the standard reorder buffer
(Flink's ascending-timestamp assumption, manufactured instead of
assumed).

Semantics per micro-batch and key:

- new events join the buffer;
- every buffered event with ``ts ≤ current watermark`` is emitted,
  sorted by (ts, <all columns>) — a TOTAL order, so ties emit
  deterministically;
- the rest stay buffered, and an event-time timeout is registered at
  the earliest retained timestamp, so a key with no further arrivals
  still flushes when the watermark passes it (no stranded state).

State is bounded by the watermark delay × per-key arrival rate (the
same bound Spark's own ``dropDuplicatesWithinWatermark`` carries);
rows are held as JSON with timestamps as epoch-µs longs, so any
primitive-typed payload passes through byte-exactly. An event older
than the watermark AT ARRIVAL is late beyond the declared bound and
is dropped — the watermark contract, not a silent reorder.

A finite replay (file source) ends with the last batch's tail still
above the final watermark; production streams keep flushing as the
watermark advances, and replays append a closing tick (any newer
event) to drain — tests/test_streaming_reorder.py shows both.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_STATE_SCHEMA = StructType([StructField("buf", StringType())])

# pandas NULLABLE dtypes per integral/boolean Spark type: a plain
# pd.DataFrame over JSON dicts silently promotes an int column holding
# None to float64/NaN, which breaks the Arrow conversion back to the
# declared LongType/IntegerType output schema (round-6 advisory) —
# materialize those columns with the extension dtypes instead
_NULLABLE_DTYPES = {
    LongType: "Int64",
    IntegerType: "Int32",
    ShortType: "Int16",
    ByteType: "Int8",
    BooleanType: "boolean",
}


def reorder_buffer(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    delay: str,
) -> DataFrame:
    """Returns ``events`` with the SAME schema, each key's rows
    released in event-time order once ``delay``-bounded watermark
    passes them. All non-key columns must be primitive-typed."""
    out_schema = events.schema
    cols = [f.name for f in out_schema.fields]
    ts_cols = [
        f.name for f in out_schema.fields if isinstance(f.dataType, TimestampType)
    ]
    nullable_dtypes = {
        f.name: _NULLABLE_DTYPES[type(f.dataType)]
        for f in out_schema.fields
        if type(f.dataType) in _NULLABLE_DTYPES
    }
    with_wm = events.withWatermark(ts_col, delay)

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        buf = json.loads(state.get[0]) if state.exists else []
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdf_iter:
            for row in pdf.to_dict("records"):
                enc = {}
                for c in cols:
                    v = row[c]
                    if c in ts_cols:
                        enc[c] = int(pd.Timestamp(v).value // 1000)  # ns → µs
                    elif pd.isna(v):
                        enc[c] = None
                    else:
                        enc[c] = v if not hasattr(v, "item") else v.item()
                if enc[ts_col] >= wm_us:  # late-beyond-bound events drop
                    buf.append(enc)
        # total order: ts first, then every column (deterministic ties)
        buf.sort(key=lambda e: tuple((e[c] is None, e[c]) for c in [ts_col] + cols))
        emit = [e for e in buf if e[ts_col] <= wm_us]
        keep = [e for e in buf if e[ts_col] > wm_us]
        if keep:
            state.update((json.dumps(keep),))
            # flush trigger for quiet keys: fire when the watermark
            # passes the earliest retained event
            state.setTimeoutTimestamp(min(e[ts_col] for e in keep) // 1000 + 1)
        elif state.exists:
            state.remove()
        if emit:
            pdf = pd.DataFrame(emit, columns=cols)
            for c in ts_cols:
                pdf[c] = pd.to_datetime(pdf[c], unit="us")
            for c, dt in nullable_dtypes.items():
                pdf[c] = pdf[c].astype(dt)
            yield pdf
        else:
            yield pd.DataFrame(columns=cols)

    return with_wm.groupBy(key_col).applyInPandasWithState(
        proc, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )

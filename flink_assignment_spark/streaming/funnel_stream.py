"""Streaming multi-step funnel via ``applyInPandasWithState``.

The streaming counterpart of ``queries.synthetic.q63_funnel`` — the
multi-step generalization of the reference's 2-step CEP
(``FlinkAssignment.scala:332-347``). Batch semantics being reproduced:
step 1 is the user's MIN-ts event of the first type; each later step k
is the MIN-ts event of its type strictly after step k-1 and within
``step_horizon_s`` of it; a user emits exactly one row, when (and only
when) the final step completes.

State design (the 100 TB argument): per key the state is O(1) — the
completed-step timestamps (at most ``len(steps)`` longs) plus a done
flag. There is NO open-match list to grow: under the in-order-per-key
contract (the reference's ``AscendingTimestampExtractor`` assumption,
reference README.md:114) the first qualifying event of a step IS the
batch ``min``, so each step is pinned the moment it is seen and later
same-type events are ignored. A funnel whose next step's horizon has
passed is marked dead immediately (step-horizon eviction of the
partial-match detail); the done/dead flag itself is retained as a
tombstone so a later first-type event cannot restart the funnel —
batch semantics key every funnel off the GLOBAL min first-step event,
so a restart would emit rows batch never produces.

Input-order contract: events must arrive in event-time order per key
ACROSS micro-batches (within a batch they are sorted here). For
out-of-order sources, compose ``streaming.reorder.reorder_buffer`` upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType


def funnel_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    step_horizon_s: float,
) -> DataFrame:
    """Returns one row per key that completes every step:
    ``(key, <step>_us ...)`` with each step's event time as epoch
    microseconds (state and output hold primitives; callers convert
    with ``timestamp_micros`` when they need timestamps).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    key_type = events.schema[key_col].dataType
    out_schema = StructType(
        [StructField(key_col, key_type)]
        + [StructField(f"{s}_us", LongType()) for s in steps]
    )
    # progress: completed-step ts (µs) as csv; flag: 1 = emitted or dead
    state_schema = StructType(
        [StructField("progress_us", StringType()), StructField("flag", LongType())]
    )
    horizon_us = int(step_horizon_s * 1_000_000)
    n_steps = len(steps)
    step_index = {s: k for k, s in enumerate(steps)}

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        done = False
        completed: list[int] = []
        if state.exists:
            csv_val, flag = state.get
            done = bool(flag)
            if csv_val:
                completed = [int(x) for x in csv_val.split(",")]
        rows = []
        # a group's rows can arrive split across several Arrow chunks in
        # NO particular order — concat before the single sort, or the
        # in-order contract silently breaks at chunk boundaries
        chunks = [pdf for pdf in pdf_iter]
        if not done and chunks:
            pdf = pd.concat(chunks).sort_values(ts_col, kind="mergesort")
            for t, ev_type in zip(pdf[ts_col], pdf[type_col]):
                t_us = int(t.value // 1000)  # pandas ns → µs
                # step-horizon eviction: a mid-funnel key whose next
                # step can no longer qualify is dead for good (the
                # pinned prefix is the batch min-prefix, so no later
                # event revises it)
                if 0 < len(completed) < n_steps and t_us > completed[-1] + horizon_us:
                    done = True
                    break
                k = step_index.get(ev_type)
                if k is None or k != len(completed):
                    continue
                if k == 0 or (completed[-1] < t_us <= completed[-1] + horizon_us):
                    completed.append(t_us)
                    if len(completed) == n_steps:
                        rows.append(tuple(key) + tuple(completed))
                        done = True
                        break
        state.update((",".join(str(x) for x in completed), 1 if done else 0))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return events.groupBy(key_col).applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

"""Streaming CDC compaction: latest-per-key state maintained
incrementally.

The streaming counterpart of batch ``q48_latest_per_key`` (and the
state side of ``q70_snapshot_diff``): a changelog stream compacts to
current state via a grouped ``max(struct(order..., payload...))`` —
the lexicographic struct max is the one aggregate both the batch
window form and an incremental state store compute identically, and
it is ALGEBRAIC (old state ⊕ new batch = max again), so Structured
Streaming keeps one struct per key and never replays history.

Output mode is ``complete``/``update`` (state, not events): each
trigger emits the refreshed latest row per touched key. At warehouse
scale the sink is an upsert (Delta/Iceberg MERGE or the staging-swap
parquet sink in ``streaming.dedup_apply``); the memory sink here is
the test harness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_state_stream(
    events: DataFrame,
    key_cols: list[str],
    order_expr: str,
    payload_cols: list[str],
) -> DataFrame:
    """Latest payload per key over an unbounded changelog.

    ``order_expr`` must be a total order per key (e.g.
    ``"struct(tus, event_id)"`` with a unique id as tiebreak —
    the same contract batch q48 pins with its window ORDER BY).
    """
    packed = F.expr(f"struct({order_expr} AS o, struct({', '.join(payload_cols)}) AS p)")
    return (
        events.groupBy(*key_cols)
        .agg(F.max(packed).alias("m"))
        .select(*key_cols, "m.p.*")
    )

"""Streaming corpus sharding — the incremental form of q77.

Shard MEMBERSHIP is the same stateless salted-hash map as the batch
query, so a doc lands in the same shard no matter when it arrives.
Intra-shard POSITIONS are assigned by a per-shard counter held in
keyed state (``applyInPandasWithState``): each shard's docs get the
next dense block of offsets in arrival order. The batch query instead
orders by (hash, doc_id) — a total order a stream cannot know — so
the cross-form contract is: identical shard membership, and positions
that are dense and unique per shard (0..n−1), NOT positionally
identical rows (tests/test_streaming_shards.py pins exactly that).
This is what a streaming shard-writer needs: append offsets within
its shard file, never a global re-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from ..functions.text import hash60

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", IntegerType()),
        StructField("pos", LongType()),
        StructField("n_chars", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("next_pos", LongType())])


def shard_assign_stream(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, shard, pos, n_chars) over a streamed corpus; shard =
    q77's salted 60-bit hash mod ``n_shards``, pos = per-shard arrival
    counter (keyed state, one long per shard)."""
    # hash60 is THE oracle-shared 60-bit hash definition — q77 and the
    # stream must derive identical shard ids from it
    h = hash60(F.concat(F.lit("shard:"), F.col(id_col).cast("string")))
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        (h % n_shards).cast("int").alias("shard"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        nxt = state.get[0] if state.exists else 0
        # concat before ordering: large shards span Arrow chunks
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        out_cols = [f.name for f in _OUT_SCHEMA.fields]
        if not len(pdf):
            state.update((nxt,))
            yield pd.DataFrame(columns=out_cols)
            return
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        pdf["pos"] = range(nxt, nxt + len(pdf))
        state.update((nxt + len(pdf),))
        yield pdf[["doc_id", "shard", "pos", "n_chars"]]

    return keyed.groupBy("shard").applyInPandasWithState(
        proc, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )

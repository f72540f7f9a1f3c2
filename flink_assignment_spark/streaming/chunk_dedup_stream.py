"""Streaming chunk-level exact substring dedup.

Incremental counterpart of ``operators.dedup.chunk_occurrences``: each
arriving document is chunked (the same narrow ``chunk_index`` pass the
batch form uses), and chunk occurrences are numbered against ALL
chunks seen so far via keyed state on the 60-bit chunk hash — a crawl
batch is scored on landing without re-scanning the corpus.

State is one counter per DISTINCT chunk hash ever seen, which is
inherent to corpus-wide exact dedup (the batch form's window reads the
same information); the state store grows with corpus vocabulary, not
with corpus size. For a bounded-memory variant with a recency horizon,
compose ``dropDuplicatesWithinWatermark`` upstream instead (see
``streaming.dedup_stream``); at warehouse scale the state store is
RocksDB-backed, and the per-key payload here is a single long.

Parity contract: with in-order replay (doc_id ascending across
micro-batches — the same contract as the other streaming operators),
``rn`` equals the batch form's global (doc_id, idx) row number,
pinned by tests/test_streaming_chunk_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from ..operators.dedup import CHUNK_TOKENS, chunk_index

_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("idx", IntegerType()),
        StructField("h", LongType()),
        StructField("rn", IntegerType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def chunk_dedup_stream(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-chunk occurrence numbers over an unbounded document stream:
    ``rn = 1`` is the first time this chunk content has EVER been
    seen; ``rn > 1`` marks duplicated text. Keyed state on the chunk
    hash holds one long (occurrences so far)."""

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        # concat BEFORE sorting: the iterator yields multiple Arrow
        # chunks for large groups (> arrow.maxRecordsPerBatch), and
        # sorting each chunk independently would misnumber occurrences
        # whose global (doc_id, idx) order crosses a chunk boundary
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        out = []
        if len(pdf):
            pdf = pdf.sort_values(["doc_id", "idx"], kind="mergesort")
            for _, r in pdf.iterrows():
                seen += 1
                out.append((int(r["doc_id"]), int(r["idx"]), key[0], seen))
        state.update((seen,))
        cols = [f.name for f in _OUT_SCHEMA.fields]
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    occ = chunk_index(docs, chunk_tokens, text_col, id_col).select("doc_id", "idx", "h")
    return occ.groupBy("h").applyInPandasWithState(
        proc, _OUT_SCHEMA, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )

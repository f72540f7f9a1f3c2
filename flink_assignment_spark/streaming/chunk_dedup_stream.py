"""Streaming exact substring dedup — chunk-aligned AND stride-1 forms.

Incremental counterparts of ``operators.dedup.chunk_occurrences`` and
``substring_occurrences`` (q68 / q88): each arriving document is
chunked (or sliding-windowed) with the same narrow index pass the
batch forms use, and occurrences are numbered against ALL content
seen so far via keyed state on the 60-bit content hash — a crawl
batch is scored on landing without re-scanning the corpus. The two
public entry points share one occurrence-numbering kernel; only the
index (chunk-aligned vs every-position windows) differs, exactly
mirroring the batch pair.

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

from ..operators.dedup import CHUNK_TOKENS, chunk_index, substring_window_index

_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _numbering_stream(occ: DataFrame, pos_col: str) -> DataFrame:
    """Shared kernel: number occurrences of each content hash across
    the stream's lifetime, ordered (doc_id, pos) within a batch."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField(pos_col, IntegerType()),
            StructField("h", LongType()),
            StructField("rn", IntegerType()),
        ]
    )

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        seen = state.get[0] if state.exists else 0
        # concat BEFORE sorting: the iterator yields multiple Arrow
        # chunks for large groups (> arrow.maxRecordsPerBatch), and
        # sorting each chunk independently would misnumber occurrences
        # whose global (doc_id, pos) order crosses a chunk boundary
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        out = []
        if len(pdf):
            pdf = pdf.sort_values(["doc_id", pos_col], kind="mergesort")
            for _, r in pdf.iterrows():
                seen += 1
                out.append((int(r["doc_id"]), int(r[pos_col]), key[0], seen))
        state.update((seen,))
        cols = [f.name for f in out_schema.fields]
        yield pd.DataFrame(out, columns=cols) if out else pd.DataFrame(columns=cols)

    return occ.groupBy("h").applyInPandasWithState(
        proc, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


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
    occ = chunk_index(docs, chunk_tokens, text_col, id_col).select("doc_id", "idx", "h")
    return _numbering_stream(occ, "idx")


def substring_dedup_stream(
    docs: DataFrame,
    k: int = CHUNK_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stride-1 sliding-window twin (batch q88): every k-token window
    at every position is numbered against the corpus-so-far, so a
    ≥k-token span copied from ANY earlier document is flagged on
    arrival regardless of chunk alignment. State cardinality is the
    distinct-window vocabulary — k× the chunk form's, the same ratio
    as the batch pair's index sizes."""
    occ = substring_window_index(docs, k, text_col, id_col).select(
        "doc_id", "pos", "h"
    )
    return _numbering_stream(occ, "pos")


def read_dup_spans(occurrences: DataFrame, k: int = CHUNK_TOKENS) -> DataFrame:
    """Maximal duplicated spans over the stream's ACCUMULATED emitted
    occurrence rows — the streaming twin of batch q104
    (``operators.dedup.substring_spans``): collect each doc's
    duplicated (``rn > 1``) positions and merge them with the same
    ``dup_spans`` array fold. ``occurrences`` is a batch frame over
    whatever sink the stream wrote (memory table, parquet dir);
    because the stream's ``rn`` equals the batch numbering under
    in-order replay, these spans equal the batch report's."""
    from pyspark.sql import functions as F

    from ..operators.dedup import dup_spans

    per_doc = (
        occurrences.filter(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("ps"))
    )
    return per_doc.select(
        "doc_id", F.explode(dup_spans(F.col("ps"), k)).alias("sp")
    ).select(
        "doc_id",
        F.col("sp.s").alias("span_start"),
        (F.col("sp.e") - F.col("sp.s")).alias("span_len"),
    )

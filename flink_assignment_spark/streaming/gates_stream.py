"""Streaming quality / decontamination gates.

A production LLM-data pipeline runs its gates INCREMENTALLY — each
crawl batch is scored as it lands, not by re-scanning the corpus. Both
gates here are stateless narrow maps (see ``operators.gates``), so the
streaming forms are the SAME operators applied to a streaming frame:
no watermark, no state store, append mode. That is the design point —
an operator expressed as per-row Catalyst expressions (or one
broadcast-armed pandas UDF) is batch/stream portable for free, where a
shuffle-based formulation (q60's broadcast-join form) would have
needed a watermarked aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.gates import contaminated_counts, repetition_stats


def repetition_gate_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition stats per streamed document."""
    return repetition_stats(docs, text_col, id_col)


def contamination_gate_stream(
    docs: DataFrame,
    probe_hashes: set[int] | frozenset[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document contaminated-shingle counts against a bounded
    (eval-benchmark) probe set, broadcast once to all workers."""
    return contaminated_counts(docs, probe_hashes, text_col, id_col, n)


def pii_gate_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + redacted-text audit for a streamed
    crawl batch — the same zero-state narrow map as the batch q59."""
    from ..operators.gates import pii_stats

    return pii_stats(docs, text_col, id_col)


def compression_gate_stream(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Byte-level compression-ratio gate for a streamed crawl batch —
    the q79 narrow map (one Arrow UDF for the deflate length, banding
    JVM-side) applied unchanged to an append-mode stream."""
    from ..operators.gates import compression_stats

    return compression_stats(docs, text_col, id_col)

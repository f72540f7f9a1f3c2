"""Streaming BM25 probe scoring.

The deployment shape mirrors ``lm_stream``: the corpus statistics
BM25 needs (N, total token count, per-probe-term df) are FROZEN
offline on a reference corpus (``operators.retrieval.
export_bm25_stats`` — a probe-sized artifact, not even vocab-scale)
and folded into the scoring expression as literals; each arriving
crawl batch is scored by a stateless narrow map of Catalyst array
ops — no shuffle, no watermark, no state store, no Python. The batch
q110 form instead trains-and-scores in one job; both evaluate the
same expression tree, so scores on the training corpus are
bit-identical (parity-tested in tests/test_retrieval.py), and the
frozen form additionally handles probe terms unseen at export time
(df = 0 → the maximal finite Lucene IDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.retrieval import BM25_PROBE_TERMS, score_with_frozen_bm25


def bm25_probe_stream(
    docs: DataFrame,
    stats: dict,
    probe_terms: tuple[str, ...] = BM25_PROBE_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document ``(doc_id, n_terms, score_micro, score)`` for a
    streamed crawl batch under the frozen corpus statistics; docs
    matching no probe term are dropped (gate semantics)."""
    return score_with_frozen_bm25(docs, stats, probe_terms, text_col, id_col)

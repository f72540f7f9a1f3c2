"""Streaming LM quality scoring.

The CCNet deployment shape: the bigram LM is TRAINED OFFLINE on a
reference corpus (``operators.lm.export_lm``) and shipped to workers
as a broadcast artifact; each arriving crawl batch is scored by a
stateless narrow map (``operators.lm.score_with_broadcast_lm``) — no
shuffle, no watermark, no state store. The batch q73 form instead
trains-and-scores in one job via vocab-scale joins; both produce
identical scores on the training corpus (parity-tested in
tests/test_streaming_lm.py), and the broadcast form additionally
handles UNSEEN bigrams via the add-1 fallback ``ln(1/V)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.lm import score_with_broadcast_lm


def lm_score_gate_stream(
    docs: DataFrame,
    lm_map: dict,
    fallback_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (n_bigrams, sum_lp_micro, avg_logprob) for a
    streamed crawl batch under the exported LM."""
    return score_with_broadcast_lm(docs, lm_map, fallback_micro, text_col, id_col)

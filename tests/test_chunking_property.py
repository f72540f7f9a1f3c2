"""Property tests: both chunkers agree with a pure-Python reference
on arbitrary token streams, and the content-defined form PARTITIONS
the token stream exactly (contiguous, non-overlapping, complete) —
the invariants the parquet-oracle tests can't probe at the edges
(1-token docs, every-token-is-a-boundary docs, window-exactly-fits
docs)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flink_assignment_spark.operators.chunking import (
    CDC_DIVISOR,
    RAG_CHUNK_STRIDE,
    RAG_CHUNK_TOKENS,
    content_defined_chunks,
    sliding_chunks,
)

_TOKEN = st.text(alphabet="abcdefgh123", min_size=1, max_size=3)
_TOKENS = st.lists(_TOKEN, min_size=1, max_size=90)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _h60(s: str) -> int:
    return int(_md5(s)[:15], 16)


def _py_sliding(toks, W=RAG_CHUNK_TOKENS, S=RAG_CHUNK_STRIDE):
    n, out, s = len(toks), [], 0
    while s < n:
        if s == 0 or s - S + W < n:
            out.append((s // S, min(W, n - s), _md5(" ".join(toks[s : s + W]))))
        s += S
    return sorted(out)


def _py_cdc(toks, D=CDC_DIVISOR):
    n = len(toks)
    starts = [0] + [i for i in range(1, n) if _h60("cdc:" + toks[i]) % D == 0]
    ends = starts[1:] + [n]
    return sorted(
        (j, s, e - s, _md5(" ".join(toks[s:e])))
        for j, (s, e) in enumerate(zip(starts, ends))
    )


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(toks=_TOKENS)
def test_sliding_chunks_match_python_reference(spark, toks):
    docs = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    got = sorted(
        (r.chunk_idx, r.n_tokens, r.chunk_hash)
        for r in sliding_chunks(docs).collect()
    )
    assert got == _py_sliding(toks)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(toks=_TOKENS)
def test_cdc_chunks_match_python_reference_and_partition(spark, toks):
    docs = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    rows = content_defined_chunks(docs).collect()
    got = sorted((r.chunk_idx, r.start_tok, r.n_tokens, r.chunk_hash) for r in rows)
    assert got == _py_cdc(toks)
    # exact partition: contiguous starts, full coverage, no overlap
    spans = sorted((r.start_tok, r.n_tokens) for r in rows)
    assert spans[0][0] == 0
    assert sum(n for _, n in spans) == len(toks)
    assert all(n >= 1 for _, n in spans)
    for (s1, n1), (s2, _) in zip(spans, spans[1:]):
        assert s1 + n1 == s2

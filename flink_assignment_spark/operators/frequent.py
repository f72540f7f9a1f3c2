"""Distributed heavy hitters: Misra-Gries candidates + exact recount.

The frequent-items member of the mergeable-summary family (HLL for
distinct, KLL for quantiles, theta for set algebra — this module for
heavy hitters): find every token whose corpus frequency exceeds
``N / phi_inv`` WITHOUT shuffling the full token stream on the token
key.

Two passes, the standard distributed shape:

1. **Candidate pass (narrow)** — each partition runs a Misra-Gries
   summary with ``phi_inv`` counters over its local token stream
   inside one Arrow-batched ``mapInPandas`` stage. Pigeonhole
   guarantee: if ``freq(x) > N / phi_inv`` globally, then in at least
   one partition ``freq_p(x) > n_p / phi_inv``, and an item that
   frequent in a partition ALWAYS survives that partition's
   Misra-Gries — so the union of partition survivors is a SUPERSET of
   the true heavy hitters (no false negatives; false positives are
   culled by pass 2). Candidate volume is bounded by
   ``phi_inv × n_partitions`` regardless of corpus size.
2. **Exact recount (one bounded shuffle)** — broadcast-semi-join the
   token stream to the candidate set, count exactly, and keep
   ``cnt * phi_inv > N`` (an integer compare — no float threshold).
   Only candidate-matching rows reach the exchange.

The total-count ``N`` rides along as NULL-token marker rows emitted
by the same kernel (one per partition), so the candidate pass is a
single scan. Both passes read the same :func:`token_stream`; pass a
persisted one via ``toks=`` (the materialized-intermediate shape at
100 TB) to tokenize once, or let the default path pay two narrow
scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .spread import spread

DEFAULT_PHI_INV = 200  # heavy = more than 0.5% of all tokens


def mg_merge_compact(counters: dict, items, phi_inv: int) -> int:
    """One weighted Misra-Gries step, shared by the batch kernel and
    the streaming per-partition kernel: fold ``items`` — an iterable of
    ``(token, weight)`` pairs (a pandas ``value_counts`` in practice,
    itself an exact zero-error summary of the Arrow batch) — into
    ``counters`` by summing, then compact with the mergeable-summaries
    rule (Agarwal et al. 2012): subtract the ``(k+1)``-th largest
    counter value from all and keep only positive remainders. At most
    ``phi_inv`` counters survive (only values strictly above the
    (k+1)-th largest can remain), and the mass argument is unchanged —
    each compaction removes ≥ ``(k+1) × dec`` total mass, so the summed
    decrements over a partition's stream stay ≤ ``n_p / (phi_inv+1)``,
    the classic MG error bound.

    Returns this step's decrement ``dec`` (0 when no compaction fired)
    so callers that report count BOUNDS can account for it — a
    partition-local decrement is invisible in the merged counters but
    still widens ``true - counter``, so it MUST be surfaced, not
    swallowed (the round-6 advisory finding on ``frequent_stream``).
    """
    for tok, w in items:
        counters[tok] = counters.get(tok, 0) + int(w)
    if len(counters) <= phi_inv:
        return 0
    dec = sorted(counters.values(), reverse=True)[phi_inv]
    survivors = {t: c - dec for t, c in counters.items() if c > dec}
    counters.clear()
    counters.update(survivors)
    return int(dec)


def token_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The exploded single-column ``token`` stream both
    :func:`heavy_hitters` passes consume. Passing a persisted copy via
    ``toks=`` pays tokenization once instead of twice — but note the
    default two-scan shape MEASURES FASTER (~1.9× at 500k docs,
    SCALING.md): tokenization is a narrow whole-stage-codegen scan,
    and materializing the exploded stream costs more than re-running
    it. Use ``toks=`` only when a tokenized frame already exists (or
    is a reused materialized intermediate in a multi-consumer job)."""
    return (
        spread(docs)
        .select(F.explode_outer(tokens(F.col(text_col))).alias("token"))
        .filter(F.col("token").isNotNull())
    )


def heavy_hitters(
    docs: DataFrame,
    phi_inv: int = DEFAULT_PHI_INV,
    text_col: str = "text",
    toks: DataFrame | None = None,
) -> DataFrame:
    """``(token, cnt, share)`` for every token with
    ``cnt * phi_inv > N`` — exact counts, exact membership.

    ``toks`` optionally supplies a pre-tokenized single-column
    ``token`` stream (ideally persisted, or a materialized
    intermediate at 100 TB); both passes — the narrow Misra-Gries
    candidate scan and the broadcast-semi-join recount — read it, so
    passing it removes the double tokenization the default path pays
    (two narrow scans of ``docs``)."""

    def mg_kernel(batches):
        import pandas as pd

        # vectorized: pandas pre-aggregates each Arrow batch to
        # (token, count) pairs, so the Python-side MG fold runs over
        # the batch's DISTINCT tokens (small on Zipfian text), not one
        # dict operation per token occurrence
        counters: dict[str, int] = {}
        n_local = 0
        for pdf in batches:
            vc = pdf["token"].value_counts()
            n_local += int(vc.sum())
            mg_merge_compact(counters, vc.items(), phi_inv)
        rows = [(t, int(c)) for t, c in counters.items()]
        rows.append((None, n_local))  # per-partition total marker
        yield pd.DataFrame(rows, columns=["token", "cnt"])

    if toks is None:
        toks = token_stream(docs, text_col)
    # cached: the tiny summary feeds the scalar N and the candidate
    # set (the q15/q16 working-frame pattern — the session owner
    # clears caches between queries)
    summary = toks.mapInPandas(mg_kernel, "token string, cnt long").cache()
    n_total = int(
        summary.filter(F.col("token").isNull()).agg(F.sum("cnt")).collect()[0][0]
    )
    cands = summary.filter(F.col("token").isNotNull()).select("token").distinct()
    return (
        toks.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * phi_inv > F.lit(n_total))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.lit(float(n_total)), 6).alias("share"),
        )
    )

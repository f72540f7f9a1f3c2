"""Corpus-trained bigram language-model scoring.

The CCNet/C4-style quality filter: train an n-gram LM on the corpus,
score every document by its average token log-probability, and gate
on the score (ill-formed or boilerplate text scores far from the
corpus mode). Here the LM is an add-1-smoothed bigram model trained
on the corpus itself — a familiarity score, the degenerate (and
fully self-contained) form of CCNet's wiki-trained KenLM.

Exactness: per-bigram log-probs are quantized to integer MICRO-NATS
(``round(ln(p)·1e6)`` as BIGINT) before the per-document sum, so the
aggregation is fold-order-independent and the result hash-matches the
DuckDB oracle exactly — a raw double sum would drift with Spark's
partial-aggregation order. ``p`` itself is a ratio of exact integers,
identical in both engines; only ``ln`` touches libm (a last-ulp
divergence would need to land within 1e-9 of a rounding boundary to
matter).

Scale shape: bigram extraction is narrow; the LM tables are
``groupBy`` counts (vocab-bounded, not corpus-bounded); scoring joins
each bigram occurrence to its two count rows — 1:1 fan-out per
occurrence, so hot bigrams cost hash-join lookups, never a quadratic
blow-up — and the final per-doc rollup shuffles on doc_id. The
occurrence frame feeds the counts AND the scoring join, so callers
should cache it (one corpus scan total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60, tokens


def bigram_occurrences(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per adjacent token pair per document:
    ``(doc_id, w1, bg)`` with ``bg = "w1 w2"``. Narrow."""
    toked = docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tk"))
    tk = F.col("tk")
    pairs = F.transform(
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
        lambda x, i: F.struct(
            x.alias("w1"), F.concat(x, F.lit(" "), F.element_at(tk, i + 2)).alias("bg")
        ),
    )
    return (
        toked.select("doc_id", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("doc_id", "p.w1", "p.bg")
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document add-1 bigram LM score:
    ``(doc_id, n_bigrams, sum_lp_micro, avg_logprob)`` where
    ``p(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V)``, summed in exact integer
    micro-nats. Docs with < 2 tokens produce no row.

    The bigram/context STRINGS are hashed to 60-bit longs immediately
    after extraction: every downstream use (the two count aggregates,
    the LM fold, the corpus-scale scoring join) only needs equality
    keys, and an 8-byte long shuffles/probes far cheaper than a
    multi-word string — measured 0.77× at 50k docs, and the gap widens
    with shuffle volume. Same md5-hash60 identity contract as the
    shingle index (``dedup.doc_shingles``): a collision would merge
    two bigrams' counts, at the same astronomically-small odds the
    dedup family already carries; the DuckDB oracle stays string-keyed
    and hash-matches bit-for-bit."""
    occ = (
        bigram_occurrences(docs, text_col, id_col)
        .select(
            "doc_id",
            hash60(F.col("w1")).alias("h1"),
            hash60(F.col("bg")).alias("hb"),
        )
        .cache()
    )
    # each bigram determines its context, so any h1 in the hb group is
    # THE context hash (max = arbitrary-but-deterministic pick)
    c_bg = occ.groupBy("hb").agg(
        F.count("*").alias("c_bg"), F.max("h1").alias("h1")
    )
    c_w1 = occ.groupBy("h1").agg(F.count("*").alias("c_w1"))
    # V is the corpus vocabulary size — one bounded scalar (the same
    # class of driver action as the IVF train-sample count)
    v = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    p = (F.col("c_bg") + 1) / (F.col("c_w1") + F.lit(int(v)))
    li = F.round(F.log(p) * 1e6).cast("long")
    # fold the unigram table into a per-bigram LM first: that join is
    # VOCAB-scale (distinct bigrams), so the corpus-scale occurrence
    # frame pays only ONE shuffle join — on Zipfian text the distinct
    # bigram table is far smaller than the occurrence stream
    lm = c_bg.join(c_w1, "h1").select("hb", li.alias("lp_micro"))
    return (
        occ.join(lm, "hb")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("sum_lp_micro"),
        )
        .withColumn(
            "avg_logprob",
            F.round(
                F.col("sum_lp_micro").cast("double") / F.col("n_bigrams") / F.lit(1e6), 6
            ),
        )
    )


DEFAULT_MAX_LM_ENTRIES = 5_000_000  # ~a few hundred MB of dict on the driver


def export_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_lm_entries: int = DEFAULT_MAX_LM_ENTRIES,
):
    """Train the add-1 bigram LM and export it as a worker-shippable
    artifact: ``(lm_map, fallback_micro, v)`` with ``lm_map[bg] =
    lp_micro`` for every corpus bigram and ``fallback_micro =
    round(ln(1/V)*1e6)`` for bigrams unseen at train time (the w1
    history itself unseen — the weakest add-1 estimate).

    This is the CCNet deployment shape: the LM is a TRAINED ARTIFACT
    (KenLM file in their case) broadcast to every worker, and scoring
    is a stateless narrow map — which is what lets the same scorer run
    over a batch frame or an append-mode stream with no shuffle and no
    state. The export is a driver collect bounded by DISTINCT-BIGRAM
    cardinality (vocab-scale, not corpus-scale) — the same boundedness
    contract as the IVF train sample; a production pipeline would
    train on a fixed reference corpus (wiki), not the full crawl.
    That contract is ENFORCED, not assumed: a corpus whose
    distinct-bigram count exceeds ``max_lm_entries`` (pathological —
    random tokens make distinct bigrams ≈ corpus size) raises
    ``ValueError`` instead of collecting, the same refusal pattern as
    ``similarity.cosine_topk``'s ``max_query_total``; such callers
    should use the join-based :func:`bigram_lm_scores`, which never
    materializes the LM on the driver.

    The lp_micro values are collected from the SAME Catalyst
    expression the batch scorer uses, so broadcast scoring is
    bit-identical to ``bigram_lm_scores`` by construction."""
    import math

    occ = bigram_occurrences(docs, text_col, id_col)
    c_bg = occ.groupBy("w1", "bg").agg(F.count("*").alias("c_bg"))
    c_w1 = occ.groupBy("w1").agg(F.count("*").alias("c_w1"))
    v = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    p = (F.col("c_bg") + 1) / (F.col("c_w1") + F.lit(int(v)))
    li = F.round(F.log(p) * 1e6).cast("long")
    lm = c_bg.join(c_w1, "w1").select("bg", li.alias("lp_micro")).cache()
    try:
        n_entries = lm.count()  # cluster-side count — nothing reaches the driver yet
        if n_entries > max_lm_entries:
            raise ValueError(
                f"export_lm: corpus has {n_entries} distinct bigrams, over the "
                f"max_lm_entries cap of {max_lm_entries} — refusing to collect a "
                "corpus-scale LM onto the driver; use the join-based "
                "bigram_lm_scores instead (or raise the cap deliberately)."
            )
        lm_map = {r["bg"]: r["lp_micro"] for r in lm.collect()}
    finally:
        lm.unpersist()
    fallback_micro = round(math.log(1.0 / int(v)) * 1e6)
    return lm_map, int(fallback_micro), int(v)


def score_with_broadcast_lm(
    docs: DataFrame,
    lm_map: dict,
    fallback_micro: int,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Same output schema/values as :func:`bigram_lm_scores`, computed
    as a NARROW MAP with the exported LM broadcast once per executor —
    zero shuffles, zero state, batch/stream portable. Tokenization
    matches the Catalyst form exactly: ASCII ``\\s+`` split (Java's
    default ``\\s`` class), empty tokens dropped."""
    import re

    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast((lm_map, fallback_micro))

    @F.pandas_udf("struct<n_bigrams: long, sum_lp_micro: long>")
    def _score(texts):
        lm, fb = bc.value
        ws = re.compile(r"\s+", re.ASCII)
        ns, sums = [], []
        for t in texts:
            if t is None:
                ns.append(0)
                sums.append(0)
                continue
            tk = [w for w in ws.split(t) if w]
            n = max(len(tk) - 1, 0)
            s = 0
            for i in range(n):
                s += lm.get(tk[i] + " " + tk[i + 1], fb)
            ns.append(n)
            sums.append(s)
        return pd.DataFrame({"n_bigrams": ns, "sum_lp_micro": sums})

    return (
        docs.select(F.col(id_col).alias("doc_id"), _score(F.col(text_col)).alias("s"))
        .filter(F.col("s.n_bigrams") > 0)
        .select(
            "doc_id",
            F.col("s.n_bigrams").alias("n_bigrams"),
            F.col("s.sum_lp_micro").alias("sum_lp_micro"),
        )
        .withColumn(
            "avg_logprob",
            F.round(
                F.col("sum_lp_micro").cast("double") / F.col("n_bigrams") / F.lit(1e6), 6
            ),
        )
    )

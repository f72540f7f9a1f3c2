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

from ..functions.text import tokens


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
    micro-nats. Docs with < 2 tokens produce no row."""
    occ = bigram_occurrences(docs, text_col, id_col).cache()
    c_bg = occ.groupBy("w1", "bg").agg(F.count("*").alias("c_bg"))
    c_w1 = occ.groupBy("w1").agg(F.count("*").alias("c_w1"))
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
    lm = c_bg.join(c_w1, "w1").select("bg", li.alias("lp_micro"))
    return (
        occ.join(lm, "bg")
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

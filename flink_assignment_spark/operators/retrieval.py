"""BM25 probe-term retrieval scoring — batch and frozen-stats forms.

The retrieval member of the quality/decontamination family: q60's
n-gram overlap finds verbatim benchmark contamination, BM25 finds
TOPICAL hits against a probe-term set (the scorer behind "pull every
crawl document that looks like it discusses the eval"). Okapi BM25
with the Lucene non-negative IDF ``ln(1 + (N − df + 0.5)/(df + 0.5))``
and k1=1.2, b=0.75 (k1·(1−b)=0.3, k1·b=0.9 — exact decimals, so the
constants fold without drift).

Two forms, exact-parity by construction:

- :func:`bm25_scores` — trains-and-scores in one job (the q110 batch
  form): one corpus tokenize pass filtered to the probe set before
  the (doc, term) aggregate, probe-sized df table broadcast, N and
  total-token-count as the two bounded driver scalars.
- :func:`score_with_frozen_bm25` — the deployment shape (mirrors
  ``operators.lm.score_with_broadcast_lm``): corpus statistics are
  FROZEN offline via :func:`export_bm25_stats` and folded into the
  scoring expression as literals; each document is scored by a
  stateless narrow map of Catalyst array ops — zero shuffle, zero
  state, zero Python, batch/stream portable. Because both forms
  evaluate the SAME Catalyst expression tree on the same integers
  (per-term contributions quantized to micro-units before an exact
  integer sum), parity is bit-level by construction — no
  Python-vs-JVM ``ln`` or rounding divergence to paper over.

Fold-order exactness: each (doc, term) contribution is one IEEE
double expression, quantized to integer micro-units; the per-doc
score is an INTEGER sum of those — order-free, the
``operators.lm`` micro-nat contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

# Default probe: deliberate IDF contrast (one rare term, three common
# ones) so rankings exercise the df term, not just tf saturation.
BM25_PROBE_TERMS = ("dup", "vector", "window", "scan")
BM25_K1 = 1.2
BM25_B = 0.75


def _contrib_micro(
    tf: Column, dl: Column, df: Column, n_docs: int, total_tokens: int
) -> Column:
    """One (doc, term) BM25 contribution in integer micro-units.

    The single expression both forms share — any change here changes
    batch and frozen scoring identically, which is what keeps the
    parity bit-level."""
    idf = F.log(
        F.lit(1.0)
        + (F.lit(int(n_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5))
    )
    denom = (
        tf
        + F.lit(0.3)
        + (F.lit(0.9) * dl * F.lit(int(n_docs))) / F.lit(int(total_tokens))
    )
    return F.round(idf * ((tf * F.lit(2.2)) / denom) * F.lit(1e6)).cast("long")


def _with_score(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "score", F.round(F.col("score_micro") / F.lit(1e6), 6)
    )


def bm25_scores(
    docs: DataFrame,
    probe_terms: tuple[str, ...] = BM25_PROBE_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train-and-score BM25 in one job: every document matching ≥1
    probe term, with ``(doc_id, n_terms, score_micro, score)``.

    Scale shape: the corpus-scale work is ONE tokenize pass filtered
    to the probe set before the (doc, term) aggregate — the shuffle
    carries only probe-term hits, never the token stream. The cached
    frame is the AGGREGATE (≤ |probe| rows per matching doc); it
    feeds both the df derivation and the scoring join, and without
    the cache each branch re-runs the corpus tokenize (re-analysis
    renumbers attributes, so ReusedExchange can't dedupe them). The
    per-term df table broadcasts; N and the total token count are two
    bounded driver scalars folded in as literals."""
    tk = tokens(F.col(text_col))
    dld = docs.select(F.col(id_col).alias("doc_id"), F.size(tk).alias("dl"))
    n_docs, total_tokens = dld.agg(F.count("*"), F.sum("dl")).collect()[0]
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tk).alias("dl"),
            F.explode(tk).alias("t"),
        )
        .filter(F.col("t").isin(*probe_terms))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count("*").alias("tf"))
        .cache()
    )
    df_t = tf.groupBy("t").agg(F.count("*").alias("df"))
    contrib = _contrib_micro(
        F.col("tf"), F.col("dl"), F.col("df"), n_docs, total_tokens
    )
    return _with_score(
        tf.join(F.broadcast(df_t), "t")
        .select("doc_id", contrib.alias("contrib_micro"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("contrib_micro").alias("score_micro"),
        )
    )


def export_bm25_stats(
    docs: DataFrame,
    probe_terms: tuple[str, ...] = BM25_PROBE_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Freeze the corpus statistics BM25 scoring needs:
    ``{"n_docs": N, "total_tokens": T, "df": {term: df}}``.

    The collect is PROBE-sized (|probe| rows) plus two scalars —
    bounded by construction, no cap needed (contrast
    ``operators.lm.export_lm``, whose artifact is vocab-scale and
    carries an enforced cap). A production pipeline freezes these on
    a reference corpus snapshot and re-exports on corpus refresh."""
    tk = tokens(F.col(text_col))
    n_docs, total_tokens = (
        docs.select(F.size(tk).alias("dl"))
        .agg(F.count("*"), F.sum("dl"))
        .collect()[0]
    )
    df_rows = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tk).alias("t"))
        .filter(F.col("t").isin(*probe_terms))
        .groupBy("t")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    )
    return {
        "n_docs": int(n_docs),
        "total_tokens": int(total_tokens),
        "df": {r["t"]: int(r["df"]) for r in df_rows},
    }


def score_with_frozen_bm25(
    docs: DataFrame,
    stats: dict,
    probe_terms: tuple[str, ...] = BM25_PROBE_TERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Same output schema/values as :func:`bm25_scores` on the corpus
    the stats were exported from, computed as a NARROW MAP: per probe
    term, tf comes from a Catalyst array scan of the token array (no
    explode, no shuffle) and the contribution folds the frozen df in
    as a literal; the per-doc integer sum is a fixed-order fold over
    the |probe|-length contribution array. Terms unseen at export
    time take df = 0 — the Lucene IDF is finite and maximal there
    (``ln(1 + (N + 0.5)/0.5)``), the standard frozen-stats behavior
    for out-of-corpus query terms."""
    n_docs = int(stats["n_docs"])
    total_tokens = int(stats["total_tokens"])
    df_map = stats["df"]
    tk = tokens(F.col(text_col))
    dl = F.size(tk)

    def term_entry(term: str) -> Column:
        tf = F.size(F.filter(tk, lambda x: x == F.lit(term)))
        contrib = _contrib_micro(
            tf, dl, F.lit(int(df_map.get(term, 0))), n_docs, total_tokens
        )
        zero = F.lit(0).cast("long")
        return F.when(
            tf > 0,
            F.struct(F.lit(1).cast("long").alias("m"), contrib.alias("c")),
        ).otherwise(F.struct(zero.alias("m"), zero.alias("c")))

    entries = F.array(*[term_entry(t) for t in probe_terms])
    init = F.lit(0).cast("long")
    return _with_score(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.aggregate(entries, init, lambda a, x: a + x["m"]).alias(
                "n_terms"
            ),
            F.aggregate(entries, init, lambda a, x: a + x["c"]).alias(
                "score_micro"
            ),
        ).filter(F.col("n_terms") > 0)
    )

"""Streaming form of the composed training-data pipeline (q83).

Every stage of the batch pipeline is streaming-safe in the same
shape, which is the payoff of how the stages were built:

- normalize + repetition gate: pure Catalyst narrow maps;
- decontamination: the broadcast probe-set membership UDF
  (``operators.gates.contaminated_counts``'s kernel) instead of the
  batch probe join — no shuffle, no state;
- exact dedup: ``dropDuplicates`` on the canonical-text hash. Here it
  is the UNBOUNDED-state variant (a replayed bounded corpus); a
  production stream bounds state with
  ``dropDuplicatesWithinWatermark`` exactly as
  ``streaming/dedup_stream.py`` does — the gate stages are unaffected
  by that swap.

Which duplicate survives is arrival-order-dependent in streaming
(batch q83 keeps min doc_id), so the batch-vs-stream parity contract
is the per-source YIELD — (n_kept, n_tokens) — which is invariant
under survivor choice because exact duplicates share their token
count by definition (tests/test_streaming_pipeline.py).
"""

# NOTE: no `from __future__ import annotations` — pandas_udf resolves
# type hints at decoration time (see operators/gates.py).

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens, word_shingles
from ..operators.gates import shingle_hash_array


def pipeline_gate_stream(
    docs: DataFrame,
    probe_hashes: set[int] | frozenset[int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """q83's normalize → repetition gate → decontamination → exact
    dedup over a streamed corpus; emits one row per SURVIVING doc:
    ``(doc_id, source, n_tokens)``."""
    ntext = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    staged = docs.select(F.col(id_col).alias("doc_id"), "source", ntext.alias("ntext"))
    tk = tokens(F.col("ntext"))
    corpus = staged.filter(F.col("doc_id") >= 20).select(
        "doc_id",
        "source",
        "ntext",
        F.greatest(F.size(tk) - 2, F.lit(0)).alias("n_total"),
        F.size(word_shingles(tk, 3)).alias("n_distinct"),
        F.size(tk).alias("n_tokens"),
    )
    passed = corpus.filter(
        (F.col("n_total") - F.col("n_distinct")) * 5 <= F.col("n_total")
    )

    bc = docs.sparkSession.sparkContext.broadcast(frozenset(probe_hashes))

    @F.pandas_udf("boolean")
    def _clean(shingle_arrays: pd.Series) -> pd.Series:
        probe = bc.value
        return shingle_arrays.apply(
            lambda arr: not any(h in probe for h in arr) if arr is not None else True
        )

    clean = passed.filter(_clean(shingle_hash_array(F.col("ntext"))))
    return (
        clean.withColumn("nh", F.md5("ntext"))
        .dropDuplicates(["nh"])
        .select("doc_id", "source", "n_tokens")
    )


def pipeline_tokenize_stream(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """BPE tokenize stage for a streamed corpus under a FROZEN merge
    table — the streaming twin of q136 (``operators.bpe.bpe_apply``).

    The apply half of the train/apply split is k literal string
    replaces in rank order — a pure Catalyst narrow map with no state,
    no shuffle, and no Python — so the BATCH column deploys on the
    stream verbatim; this wrapper only freezes the rule table first
    (``merges`` may be the ``bpe_merges_df`` artifact DataFrame or the
    trainer's list): materializing it here keeps the collect out of
    the streaming plan, the train-once/apply-always seam every frozen
    artifact (BM25 stats, IVF centroids, quality cutoffs) follows.
    Emits ``(doc_id, bpe_tokens, n_bpe_tokens)``; batch-vs-stream
    parity is exact per row (tests/test_streaming_pipeline.py)."""
    from ..operators.bpe import bpe_apply

    if isinstance(merges, DataFrame):
        merges = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in merges.collect()
        ]
    toks = bpe_apply(merges, text_col, lowercase)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("bpe_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
    )

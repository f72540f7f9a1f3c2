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


def bloom_contamination_gate_stream(
    docs: DataFrame,
    bloom_bits: bytes,
    n_bits: int,
    k: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """The bounded-memory contamination gate for streams whose probe
    set outgrew a broadcast Python set: the fixed-size Bloom bitmap
    (operators.gates.build_bloom) ships once per executor; counts are
    a zero-false-negative upper bound (flag superset — the correct
    failure direction for a gate). Same stateless narrow map as the
    exact form."""
    from ..operators.gates import bloom_contaminated_counts

    return bloom_contaminated_counts(docs, bloom_bits, n_bits, k, text_col, id_col, n)


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


def semantic_gate_stream(
    vectors: DataFrame,
    probes: DataFrame | None,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_blocks=None,
) -> DataFrame:
    """Embedding-space decontamination gate for a streamed corpus —
    the batch q122 operator applied UNCHANGED to a streaming frame:
    the probe block is bounded and broadcast, and the per-row
    max cosine reduces inside the mapInPandas kernel, so the whole op
    is a stateless narrow map (no aggregate state, append mode).
    ``probes`` must be a STATIC frame (the eval benchmark); refresh =
    restart with the new block, same as the BM25 frozen stats.
    ``probe_blocks`` is the frozen-artifact restart path: persist the
    collected probe set once (operators.similarity.save_probe_blocks)
    and a gate restart loads it (load_probe_blocks) instead of
    re-collecting the eval union through Spark."""
    from ..operators.similarity import semantic_contamination

    return semantic_contamination(
        vectors, probes, threshold, id_col, vec_col, probe_blocks=probe_blocks
    )


def quality_cutoffs(docs: DataFrame, keep_per_5: int = 1) -> DataFrame:
    """Batch half of the deployable quality-prune gate: compute
    q116's exact per-source kept-set boundary — (cutoff_score,
    cutoff_doc_id) of the LAST kept row under the (quality_score
    desc, doc_id asc) total order — as a tiny one-row-per-source
    frame. Sources too small to keep anything (n_docs < 5) emit no
    row, which the gate reads as keep-nothing.

    This is the frozen-stats pattern (same as BM25's
    export/score split): the expensive global ranking runs once in
    batch; streams apply the frozen boundary statelessly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..functions.text import composite_quality_score

    scored = docs.select(
        "doc_id", "source", composite_quality_score(F.col("text")).alias("quality_score")
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "quality_score",
        F.row_number().over(w).alias("rnk"),
        F.count("*").over(Window.partitionBy("source")).alias("n_docs"),
    ).filter(F.col("rnk") * 5 <= F.col("n_docs") * keep_per_5)
    boundary = F.max_by(
        F.struct(
            F.col("quality_score").alias("cutoff_score"),
            F.col("doc_id").alias("cutoff_doc_id"),
        ),
        F.col("rnk"),
    ).alias("b")
    return ranked.groupBy("source").agg(boundary).select(
        "source", "b.cutoff_score", "b.cutoff_doc_id"
    )


def quality_prune_stream(docs: DataFrame, cutoffs: DataFrame) -> DataFrame:
    """Streaming half: score each arriving doc with the same
    expression and keep it iff it clears the frozen boundary —
    score > cutoff, or score == cutoff and doc_id ≤ the boundary
    doc_id (the exact tie rule of the batch total order, so the gate
    equals batch q116 row-for-row on a replayed corpus). Stateless:
    one stream-static broadcast join on source, no watermark. An
    unknown source (no cutoff row) keeps nothing — the conservative
    read of "the batch pass never ranked this source"."""
    from pyspark.sql import functions as F

    from ..functions.text import composite_quality_score

    scored = docs.select(
        "doc_id", "source", composite_quality_score(F.col("text")).alias("quality_score")
    )
    joined = scored.join(F.broadcast(cutoffs), "source", "inner")
    kept = (F.col("quality_score") > F.col("cutoff_score")) | (
        (F.col("quality_score") == F.col("cutoff_score"))
        & (F.col("doc_id") <= F.col("cutoff_doc_id"))
    )
    return joined.filter(kept).select("doc_id", "source", "quality_score")

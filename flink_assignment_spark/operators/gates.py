"""Quality / decontamination gates over a document frame.

Both gates are NARROW MAPS (per-row expressions, zero shuffles), which
makes them the rare operators that run UNCHANGED as batch
transformations and as Structured Streaming stages — the module is
shared by ``queries.synthetic`` (q60/q61 batch forms) and
``streaming.gates_stream``.

- :func:`repetition_stats` — the Gopher-style within-document
  repetition rule: total vs distinct word-3-gram counts and the
  duplicate-shingle ratio. Pure array expressions.
- :func:`contaminated_counts` — GPT-3-style n-gram decontamination
  against a bounded probe set (eval-benchmark shingles). The batch
  query form uses a broadcast hash join on the exploded shingle index
  (``q60_contamination``); this per-row form broadcasts the probe set
  itself and counts membership inside an Arrow-batched pandas UDF —
  the shape that drops into an append-mode stream with no watermark
  and no state. Probe sets are small by construction (eval suites,
  not corpora); the broadcast is the same one the batch join ships.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf resolves
# the UDF's `pd.Series` type hints at decoration time, and postponed
# (string) annotations break that resolution

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60, tokens, word_shingles


def shingle_hash_array(text: Column, n: int = 3) -> Column:
    """Distinct word-n-gram 60-bit shingle hashes of a text column,
    as an array — the in-row twin of ``dedup.doc_shingles``'s exploded
    index (same tokenize → shingle → hash60 pipeline, same values)."""
    return F.transform(word_shingles(tokens(text), n), hash60)


def repetition_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_shingles_total, n_shingles_distinct, dup_shingle_ratio,
    passes_repetition_filter) per document.

    Staged through aliased columns so the expensive subtrees
    (tokenize, shingle array_distinct) evaluate ONCE per row: inlining
    them into every ratio expression re-runs the whole array pipeline
    per reference (measured 10.9 s → ~1 s at sf0.1)."""
    counted = docs.select(
        id_col, tokens(F.col(text_col)).alias("tk")
    ).select(
        id_col,
        F.greatest(F.size("tk") - 2, F.lit(0)).alias("n_total"),
        F.size(word_shingles(F.col("tk"), 3)).alias("n_distinct"),
    )
    ratioed = counted.select(
        id_col,
        "n_total",
        "n_distinct",
        F.when(
            F.col("n_total") > 0,
            F.round(
                (F.col("n_total") - F.col("n_distinct")).cast("double")
                / F.col("n_total").cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("dup_ratio"),
    )
    return ratioed.select(
        id_col,
        F.col("n_total").alias("n_shingles_total"),
        F.col("n_distinct").alias("n_shingles_distinct"),
        F.col("dup_ratio").alias("dup_shingle_ratio"),
        (F.col("dup_ratio") <= 0.2).alias("passes_repetition_filter"),
    )


def contaminated_counts(
    docs: DataFrame,
    probe_hashes: set[int] | frozenset[int],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(id, n_contaminated_shingles, contaminated) per document, via a
    broadcast membership probe inside one pandas UDF — no shuffle, no
    state; works identically on batch and streaming frames."""
    bc = docs.sparkSession.sparkContext.broadcast(frozenset(probe_hashes))

    @F.pandas_udf("int")
    def _n_hits(shingle_arrays: pd.Series) -> pd.Series:
        probe = bc.value
        return shingle_arrays.apply(
            lambda arr: sum(1 for h in arr if h in probe) if arr is not None else 0
        )

    return docs.select(
        id_col,
        _n_hits(shingle_hash_array(F.col(text_col), n)).alias("n_contaminated_shingles"),
    ).withColumn("contaminated", F.col("n_contaminated_shingles") > 0)


# PCRE subset shared by Spark (Java regex) and DuckDB (RE2): no
# backrefs, no lookaround, so both engines match identical spans.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def pii_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII scrub gate: per-document email/URL counts plus the redacted
    text's length and md5 (the downstream pipeline consumes redacted
    text; the audit row is what the gate reports). A pure narrow map
    of JVM-side regexes — zero shuffles, zero state — so it applies
    unchanged to a batch frame or an append-mode stream."""
    text = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), URL_RE, "<URL>"
    )
    return docs.select(
        id_col,
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(URL_RE), 0)).alias("n_urls"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_hash"),
    )


ZLIB_LEVEL = 6
COMPRESS_REPETITIVE = 0.35  # ratio below -> boilerplate / looped spam
COMPRESS_RANDOM = 0.90  # ratio above -> base64 / random noise


def compression_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Byte-level compression-ratio quality gate (q79 batch form):
    deflate length via one Arrow-batched UDF, ratio math and banding
    JVM-side. A stateless narrow map — batch/stream portable like the
    other gates in this module. A ``source`` column is carried through
    when present (the q79 shape) but not required, matching the
    any-document-frame contract of the sibling gates. Empty AND NULL
    documents band as ``empty`` (either way the ratio is undefined and
    NULL; without an explicit branch a NULL ``raw_bytes`` would make
    every ``when`` condition NULL and silently fall through to
    'ok')."""
    from ..functions._pandas_udfs import make_zlib_len_udf

    zl = make_zlib_len_udf(ZLIB_LEVEL)
    raw_len = F.length(F.encode(F.col(text_col), "utf-8"))
    carry = ["source"] if "source" in docs.columns else []
    return (
        docs.select(
            id_col,
            *carry,
            raw_len.alias("raw_bytes"),
            zl(F.col(text_col)).alias("zlib_bytes"),
        )
        .withColumn(
            "ratio",
            F.when(
                F.col("raw_bytes") > 0,
                F.round(F.col("zlib_bytes") / F.col("raw_bytes"), 4),
            ),
        )
        .select(
            id_col,
            *carry,
            "raw_bytes",
            "zlib_bytes",
            "ratio",
            F.when(F.coalesce(F.col("raw_bytes"), F.lit(0)) == 0, F.lit("empty"))
            .when(F.col("ratio") < COMPRESS_REPETITIVE, F.lit("repetitive"))
            .when(F.col("ratio") > COMPRESS_RANDOM, F.lit("random"))
            .otherwise(F.lit("ok"))
            .alias("band"),
        )
    )

"""Document chunking — the pre-embedding / pre-dedup segmentation
passes of a training-data pipeline, in two complementary forms:

- :func:`sliding_chunks` — fixed-geometry overlapping token windows
  (the RAG / context-window prep step; q111). Window starts are
  0, S, 2S, …; a trailing partial window is emitted only when it
  extends past its predecessor's end (a fully-contained tail adds no
  new tokens).
- :func:`content_defined_chunks` — FastCDC/LBFS-style boundaries at
  token granularity (q112): a chunk opens before every token whose
  content hash hits the divisor, so boundaries move WITH the content.
  An edit shifts only the chunk it lands in; every later boundary
  re-synchronizes — the property storage-style dedup needs.

Both are pure narrow Catalyst (tokenize → positions → posexplode →
slice → md5): ZERO shuffles, so they run unchanged on a streaming
DataFrame (no state, no watermark — every row maps independently) and
at 100 TB they scale with input splits alone. Chunk fingerprints use
the join-with-space md5 convention shared with the chunk-dedup family
(operators/dedup.py), so either chunker's output feeds the same
downstream dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60, tokens

RAG_CHUNK_TOKENS = 32  # sliding window W
RAG_CHUNK_STRIDE = 16  # sliding stride S (50% overlap)
CDC_DIVISOR = 16  # content-defined expected chunk length


def _tokenized(docs: DataFrame) -> DataFrame:
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("tk"))
        .withColumn("n", F.size("tk"))
        .filter(F.col("n") > 0)
    )


def sliding_chunks(
    docs: DataFrame, window: int = RAG_CHUNK_TOKENS, stride: int = RAG_CHUNK_STRIDE
) -> DataFrame:
    """Overlapping sliding-window chunks with provenance:
    (doc_id, chunk_idx, n_tokens, chunk_hash). Boundary contract:
    starts are 0, S, 2S, … while start < n_tokens, and a start > 0 is
    kept only if start − S + W < n (its window adds tokens beyond the
    previous chunk's end)."""
    W, S = window, stride
    tk = _tokenized(docs)
    starts = tk.select(
        "doc_id",
        "tk",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(S))).alias("s"),
    ).filter((F.col("s") == 0) | (F.col("s") - S + W < F.col("n")))
    return starts.select(
        "doc_id",
        (F.col("s") / S).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(W), F.col("n") - F.col("s")).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(F.slice("tk", F.col("s") + 1, W), " ")).alias("chunk_hash"),
    )


def content_defined_chunks(docs: DataFrame, divisor: int = CDC_DIVISOR) -> DataFrame:
    """Content-defined chunks with provenance:
    (doc_id, chunk_idx, start_tok, n_tokens, chunk_hash). A boundary
    falls BEFORE every token (position ≥ 1) whose
    hash60('cdc:'+token) % divisor == 0; position 0 always starts
    chunk 0. Expected chunk length is the divisor."""
    d = _tokenized(docs)
    # 0-based cut positions; n == 1 guard: sequence(1, 0) would
    # generate a DESCENDING sequence
    cuts = F.when(
        F.col("n") >= 2,
        F.filter(
            F.sequence(F.lit(1), F.col("n") - 1),
            lambda i: hash60(F.concat(F.lit("cdc:"), F.get("tk", i))) % divisor == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(0)), cuts)
    spans = d.withColumn("starts", starts).withColumn(
        "ends",
        F.concat(F.slice("starts", 2, F.size("starts") - 1), F.array(F.col("n"))),
    )
    ex = spans.select(
        "doc_id",
        "tk",
        F.posexplode(
            F.arrays_zip(F.col("starts").alias("s"), F.col("ends").alias("e"))
        ),
    )
    return ex.select(
        "doc_id",
        F.col("pos").cast("bigint").alias("chunk_idx"),
        F.col("col.s").cast("bigint").alias("start_tok"),
        (F.col("col.e") - F.col("col.s")).cast("bigint").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.slice("tk", F.col("col.s") + 1, F.col("col.e") - F.col("col.s"))
            )
        ).alias("chunk_hash"),
    )

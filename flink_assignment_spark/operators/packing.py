"""Sequence packing: chunk a token stream into fixed-length training
sequences and report how efficiently the corpus packs.

GPT-style pretraining concatenates documents (with separators) and
slices the stream into fixed ``capacity``-token sequences; a document
whose tokens straddle a slice boundary is split across two training
examples. The packing itself is a writer-side concern — what the
*engine* must provide is the deterministic document→sequence
assignment and the packing efficiency stats that drive corpus
budgeting (how many sequences a corpus yields, what fraction of
documents get split).

Determinism at 100 TB is the hard part. A naive "concatenate the
whole corpus in doc_id order" is a single global sort — one
partition's window per source, unbounded by cluster size (the classic
window-skew failure: ``Window.partitionBy(source)`` puts ALL of a
source's rows in one task). Instead the stream is sharded: each doc
hashes to one of ``n_shards`` independent token streams per source
(the same salted-md5 hash the sampling operators use, so the
assignment survives repartitioning and is reproducible by the DuckDB
oracle). Packing per (source, shard) bounds every window partition at
|source|/n_shards rows and loses nothing a trainer cares about —
sequences need deterministic membership, not one global order. At
cluster scale ``n_shards`` is sized so a shard's doc-offset window
fits one task comfortably (e.g. 2^14 shards for a 100 TB source).

Plan shape: one exchange for the (source, shard) window sort, then a
partial+final aggregation that reuses nothing wider than the source
key. No Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60, tokens

PACK_CAPACITY = 2048
PACK_SHARDS = 64


def pack_stats(
    docs: DataFrame,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-``group_col`` packing efficiency of concatenate-and-chunk
    at ``capacity`` tokens per sequence.

    Returns one row per group: ``n_docs``, ``total_tokens``,
    ``n_seqs`` (sequences produced, summing per-shard ceilings),
    ``n_straddlers`` (docs split across a sequence boundary) and
    ``avg_fill`` (token utilization of the produced sequences).
    """
    per_doc = docs.select(
        F.col(group_col).alias("grp"),
        (hash60(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))) % n_shards).alias(
            "shard"
        ),
        F.col(id_col).alias("doc"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )
    w = (
        Window.partitionBy("grp", "shard")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("off")
    offset = per_doc.select("grp", "shard", "n_tok", cum_before)
    # a doc straddles a boundary iff its first and last token land in
    # different capacity-sized slices; empty docs occupy no tokens and
    # never straddle (greatest(n_tok, 1) keeps end_off >= off for them
    # without changing non-empty docs)
    straddles = (
        F.floor(F.col("off") / capacity)
        != F.floor((F.col("off") + F.greatest(F.col("n_tok"), F.lit(1)) - 1) / capacity)
    ).cast("int")
    per_shard = offset.groupBy("grp", "shard").agg(
        F.count("*").alias("docs"),
        F.sum("n_tok").alias("toks"),
        F.sum(straddles).alias("straddlers"),
    )
    return (
        per_shard.groupBy("grp")
        .agg(
            F.sum("docs").alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.sum(F.ceil(F.col("toks") / capacity)).alias("n_seqs"),
            F.sum("straddlers").alias("n_straddlers"),
        )
        .withColumn(
            "avg_fill",
            F.round(F.col("total_tokens") / (F.col("n_seqs") * capacity), 6),
        )
        .withColumnRenamed("grp", group_col)
    )

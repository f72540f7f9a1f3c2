"""Streaming sequence-packing stats via ``applyInPandasWithState``.

The streaming twin of ``operators.packing.pack_stats`` (q66): a crawl
pipeline tracks corpus-budget numbers (sequences yielded, straddler
fraction, fill) as documents arrive, rather than re-packing the
corpus nightly. Batch semantics being reproduced exactly: docs hash
to one of ``n_shards`` token streams per source (the SAME salted-md5
shard assignment, computed JVM-side on the stream), and a doc
straddles a boundary iff its first and last token land in different
``capacity``-sized slices of its shard's cumulative stream.

State design (the 100 TB argument): per (source, shard) key the
state is THREE longs — docs seen, cumulative tokens, straddlers.
Key cardinality is |sources|·n_shards regardless of corpus size, and
the per-doc fold is O(1): the running token offset IS the window
``sum() over (order by doc)`` unrolled, so in-order arrival makes the
stream's offsets equal the batch window's bit-for-bit. Everything
text-related (tokenize, count) runs JVM-side before the stateful
stage — Python sees only (doc, n_tok) longs.

Each key emits one CUMULATIVE stats row per micro-batch it appears
in; cumulative counts are monotone, so the latest row per key is the
current truth and :func:`latest_pack_stats` reduces a memory/table
sink to the batch ``pack_stats`` output shape.

Input-order contract: docs must arrive in ``doc`` order per shard
across micro-batches (sorted within a batch here) — the shared
in-order replay contract; out-of-order arrival would permute
concatenation order and move boundary positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.text import hash60, tokens
from ..operators.packing import PACK_CAPACITY, PACK_SHARDS


def pack_stats_stream(
    docs: DataFrame,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-(group, shard) cumulative packing counters, one row per
    key per micro-batch: ``(grp, shard, docs, toks, straddlers)``."""
    skinny = docs.select(
        F.col(group_col).alias("grp"),
        (
            hash60(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))) % n_shards
        ).alias("shard"),
        F.col(id_col).alias("doc"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )
    out_schema = StructType(
        [
            StructField("grp", StringType()),
            StructField("shard", LongType()),
            StructField("docs", LongType()),
            StructField("toks", LongType()),
            StructField("straddlers", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("docs", LongType()),
            StructField("toks", LongType()),
            StructField("straddlers", LongType()),
        ]
    )

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        docs_n, cum, straddlers = state.get if state.exists else (0, 0, 0)
        chunks = [pdf for pdf in pdf_iter]
        if chunks:
            pdf = pd.concat(chunks).sort_values("doc", kind="mergesort")
            for n in pdf["n_tok"]:
                n = int(n)
                off = cum
                if off // capacity != (off + max(n, 1) - 1) // capacity:
                    straddlers += 1
                cum += n
                docs_n += 1
        state.update((docs_n, cum, straddlers))
        yield pd.DataFrame(
            [(key[0], int(key[1]), docs_n, cum, straddlers)],
            columns=[f.name for f in out_schema.fields],
        )

    return skinny.groupBy("grp", "shard").applyInPandasWithState(
        proc, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def latest_pack_stats(
    emitted: DataFrame, capacity: int = PACK_CAPACITY, group_col: str = "source"
) -> DataFrame:
    """Reduce a sink of per-batch cumulative rows to the batch
    ``pack_stats`` shape: latest (= max-docs, counts are monotone)
    row per key, rolled up per group."""
    latest = emitted.groupBy("grp", "shard").agg(
        F.max_by(F.struct("docs", "toks", "straddlers"), F.col("docs")).alias("s")
    )
    return (
        latest.groupBy("grp")
        .agg(
            F.sum("s.docs").alias("n_docs"),
            F.sum("s.toks").alias("total_tokens"),
            F.sum(F.ceil(F.col("s.toks") / capacity)).alias("n_seqs"),
            F.sum("s.straddlers").alias("n_straddlers"),
        )
        .withColumn(
            "avg_fill",
            F.round(F.col("total_tokens") / (F.col("n_seqs") * capacity), 6),
        )
        .withColumnRenamed("grp", group_col)
    )

"""Streaming per-group top-K by score — incremental deterministic
sampling.

The streaming twin of the smallest/largest-K sampling family: q72's
fixed global budget, q93's Efraimidis-Spirakis weighted draw, q100's
per-group budget are all "keep the K best-scored rows (per group)",
and a crawl pipeline maintains that selection AS DOCS ARRIVE rather
than re-sorting the corpus. Because a later arrival can EVICT an
earlier selection, an append-mode stream cannot emit final membership
row-by-row; instead each key emits its full current top-K with a
monotonically increasing ``version`` every batch it changes, and
:func:`latest_topk` reduces any sink to the current selection (the
same cumulative-emission pattern as the packing stream). State per
group is exactly K (score, id) pairs — bounded for the stream's
lifetime regardless of corpus size.

Determinism matches the batch forms: ordering is (score, id)
ascending with ``largest=False`` (smallest-K, the q72/q100 hash
order) or (score desc, id asc) with ``largest=True`` (the q93 A-ES
order), so ties resolve identically to the batch window/TakeOrdered.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = StructType(
    [StructField("buf", StringType()), StructField("version", LongType())]
)


def topk_stream(
    rows: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    k: int,
    largest: bool = False,
) -> DataFrame:
    """Per-group top-K maintenance over a stream of scored rows.
    Emits ``(group, id, score, rk, version)`` — the key's FULL current
    selection, re-emitted with a bumped version whenever membership or
    order changes."""
    group_type = rows.schema[group_col].dataType
    out_schema = StructType(
        [
            StructField(group_col, group_type),
            StructField(id_col, LongType()),
            StructField(score_col, DoubleType()),
            StructField("rk", IntegerType()),
            StructField("version", LongType()),
        ]
    )

    def proc(key, pdf_iter, state: GroupState):
        import pandas as pd

        if state.exists:
            buf_json, version = state.get
            buf = [tuple(e) for e in json.loads(buf_json)]
        else:
            buf, version = [], 0
        before = list(buf)
        for pdf in pdf_iter:
            for i, s in zip(pdf[id_col], pdf[score_col]):
                buf.append((float(s), int(i)))
        # total deterministic order; ties on score resolve by id asc
        buf.sort(key=lambda e: (-e[0] if largest else e[0], e[1]))
        buf = buf[:k]
        cols = [f.name for f in out_schema.fields]
        if buf == before:
            yield pd.DataFrame(columns=cols)
            return
        version += 1
        state.update((json.dumps(buf), version))
        yield pd.DataFrame(
            [
                (key[0], i, s, rk + 1, version)
                for rk, (s, i) in enumerate(buf)
            ],
            columns=cols,
        )

    return rows.groupBy(group_col).applyInPandasWithState(
        proc, out_schema, _STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )


def latest_topk(emitted: DataFrame, group_col: str) -> DataFrame:
    """Reduce a sink of versioned emissions to each group's CURRENT
    selection: rows carrying the group's max version. (The aggregate
    side is RENAMED before the join — it derives from the same plan,
    and same-source attributes defeat both bare and aliased
    self-join resolution on memory-sink views.)"""
    agg = (
        emitted.groupBy(group_col)
        .agg(F.max("version").alias("__v"))
        .withColumnRenamed(group_col, "__g")
    )
    return (
        emitted.join(agg, F.col(group_col) == F.col("__g"))
        .filter(F.col("version") == F.col("__v"))
        .drop("__g", "__v", "version")
    )

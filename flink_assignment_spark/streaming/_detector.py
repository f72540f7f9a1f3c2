"""Generic incremental bucketed near-dup detector.

One engine under both streaming detectors (MinHash-LSH and SimHash):
each micro-batch arrives as bucket rows — ``(key cols…, doc_id,
payload)`` — and the engine joins them against the corpus-so-far's
bucket state (new×old), within the batch (new×new), scores each
colliding pair from the two payloads, appends the scored pairs, and
folds the batch's rows into bucket-partitioned state with the sticky
saturation valve. The detectors differ ONLY in how rows are built
(band signatures vs pigeonhole bit-blocks), the payload type, and the
pair score (signature-agreement estimate vs exact popcount) — those
arrive as parameters; every state/crash/replay behavior lives here
once, so a fix cannot drift between detectors.

Contract (shared by both wrappers, pinned by their test suites):

- candidate completeness is order-independent — a pair meets in state
  (new×old) or in one batch (new×new), exactly once either way;
- ``max_state_bucket`` sticky saturation: an over-cap bucket collapses
  to a tombstone, stops emitting, stops growing;
- replay: ``_applied_batch`` marker; pair appends may duplicate and
  are distinct'd at read.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ._state import applied_batch, commit_marker, swap_partitions

N_PT = 64


def pairs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "pairs")


def buckets_path(state_dir: str) -> str:
    return os.path.join(state_dir, "buckets")


def with_pt(rows: DataFrame, key_cols: list[str]) -> DataFrame:
    """Attach the state-partition id derived from the bucket key."""
    return rows.withColumn(
        "pt", F.pmod(F.crc32(F.concat_ws("|", *key_cols)), F.lit(N_PT)).cast("int")
    )


def merge_detector_batch(
    rows: DataFrame,
    batch_id: int,
    state_dir: str,
    key_cols: list[str],
    payload_col: str,
    payload_type: str,
    score: Callable[[Column, Column], Column],
    score_name: str,
    score_keep: Callable[[Column], Column] | None = None,
    max_state_bucket: int | None = None,
) -> None:
    """Fold one micro-batch of bucket ``rows`` (must already carry
    ``pt`` via :func:`with_pt`) into the detector state, appending the
    scored pairs ``(doc_a, doc_b, <score_name>)``. ``score_keep``
    optionally filters pairs on the score column (e.g. hamming ≤ k);
    ``None`` keeps every colliding pair (the LSH estimate form)."""
    if batch_id <= applied_batch(state_dir):
        return
    spark = rows.sparkSession
    bpath = buckets_path(state_dir)
    rows = rows.cache()
    touched = [int(r.pt) for r in rows.select("pt").distinct().collect()]
    if not touched:
        rows.unpersist()
        commit_marker(state_dir, batch_id)
        return

    on_keys = [
        F.col(f"n.{k}") == F.col(f"o.{k}") for k in key_cols
    ]
    have_state = os.path.exists(os.path.join(bpath, "_SUCCESS"))
    if have_state:
        # one cached read of the touched partitions feeds BOTH the
        # candidate join and the state fold
        state = (
            spark.read.option("basePath", bpath)
            .parquet(bpath)
            .filter(F.col("pt").isin(touched))
            .cache()
        )
        live = state.filter(F.col("doc_id").isNotNull())  # skip tombstones
        cond = on_keys[0]
        for c in on_keys[1:]:
            cond = cond & c
        new_old = (
            rows.alias("n")
            .join(live.alias("o"), cond & (F.col("n.doc_id") != F.col("o.doc_id")))
            .select(
                F.least("n.doc_id", "o.doc_id").alias("doc_a"),
                F.greatest("n.doc_id", "o.doc_id").alias("doc_b"),
                score(F.col(f"n.{payload_col}"), F.col(f"o.{payload_col}")).alias(
                    score_name
                ),
            )
        )
        # members landing in an already-saturated bucket emit nothing
        tombstoned = state.filter(F.col("doc_id").isNull()).select(*key_cols)
        new_new_src = rows.join(F.broadcast(tombstoned), key_cols, "left_anti")
    else:
        state = None
        new_old = None
        new_new_src = rows
    cond2 = F.col(f"a.{key_cols[0]}") == F.col(f"b.{key_cols[0]}")
    for k in key_cols[1:]:
        cond2 = cond2 & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    new_new = (
        new_new_src.alias("a")
        .join(new_new_src.alias("b"), cond2 & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            score(F.col(f"a.{payload_col}"), F.col(f"b.{payload_col}")).alias(
                score_name
            ),
        )
    )
    pairs = new_new if new_old is None else new_new.unionByName(new_old)
    if score_keep is not None:
        pairs = pairs.filter(score_keep(F.col(score_name)))
    pairs = pairs.distinct().cache()
    if pairs.count():
        pairs.write.mode("append").parquet(pairs_path(state_dir))
    pairs.unpersist()

    # fold the batch's bucket rows into the touched pt partitions;
    # buckets crossing max_state_bucket collapse to a tombstone row
    out = rows.select("pt", *key_cols, "doc_id", payload_col)
    if state is not None:
        out = state.select("pt", *key_cols, "doc_id", payload_col).unionByName(out)
    out = out.distinct()
    if max_state_bucket is not None:
        # saturation is STICKY: a bucket already tombstoned keeps only
        # its tombstone (new arrivals are dropped), and a live bucket
        # crossing the cap this batch collapses to a fresh tombstone
        keys = ["pt", *key_cols]
        as_tomb = lambda df: df.select(  # noqa: E731
            *keys,
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast(payload_type).alias(payload_col),
        )
        old_tombs = out.filter(F.col("doc_id").isNull()).select(*keys).distinct()
        live = out.filter(F.col("doc_id").isNotNull()).join(
            F.broadcast(old_tombs), keys, "left_anti"
        )
        hot = (
            live.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_state_bucket)
            .select(*keys)
        )
        out = (
            live.join(F.broadcast(hot), keys, "left_anti")
            .unionByName(as_tomb(old_tombs))
            .unionByName(as_tomb(hot))
        )
    swap_partitions(
        out.select(*key_cols, "doc_id", payload_col, "pt"), bpath, "pt", touched
    )
    if state is not None:
        state.unpersist()
    rows.unpersist()
    commit_marker(state_dir, batch_id)


def read_pairs(
    spark: SparkSession, state_dir: str, schema: str
) -> DataFrame:
    """Accumulated distinct scored pairs; a stream that has processed
    batches but never collided creates no pairs/ directory — a
    legitimate empty result."""
    path = pairs_path(state_dir)
    if not os.path.exists(path):
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path).distinct()

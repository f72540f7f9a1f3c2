"""Incremental corpus manifest — the streaming twin of q149
(operators/manifest.corpus_manifest).

The manifest digest is a SUM mod 2^63, so the incremental fold is
pure arithmetic: each micro-batch's own manifest (the batch operator
verbatim) merges into the persisted one by adding counts and digests
per bucket — commutative and associative, so the final manifest
equals the batch operator on the union of everything ingested, under
ANY batch boundaries or arrival order. Retractions are the same fold
with ``sign=-1`` (subtraction mod 2^63): feeding an erasure stream's
tombstoned rows keeps the live manifest equal to a from-scratch
rebuild without them — the integrity audit stays current THROUGH
deletes, which is the point of pairing it with the RTBF paths.

State is one tiny table (≤ n_buckets rows); the fold is a whole-table
``backend.replace`` whose meta carries the applied batch id
atomically with the data (the mixture/drift contract) — replays skip,
and there is no crash window in which data and marker disagree."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.manifest import N_BUCKETS, _WRAP, corpus_manifest
from ._state import DEFAULT_BACKEND

TABLE = "manifest"


def _path(state_dir: str) -> str:
    return os.path.join(state_dir, TABLE)


def merge_manifest_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    key_col: str,
    content_cols: list[str],
    sign: int = 1,
    n_buckets: int = N_BUCKETS,
    backend=None,
) -> None:
    """Fold one micro-batch (``sign=+1``) or retraction batch
    (``sign=-1``, e.g. an erasure stream's purged rows) into the live
    manifest."""
    if sign not in (1, -1):
        raise ValueError(f"sign must be +1 or -1, got {sign}")
    backend = backend or DEFAULT_BACKEND
    spark = batch_df.sparkSession
    path = _path(state_dir)
    meta = backend.read_meta(path) or {}
    if int(meta.get("applied", -1)) >= batch_id:
        return

    bm = corpus_manifest(batch_df, key_col, content_cols, n_buckets)
    cur = backend.read(spark, path)
    if cur is not None:
        both = cur.select("bucket", "n_rows", "digest").unionByName(
            bm.select(
                "bucket",
                (F.col("n_rows") * sign).alias("n_rows"),
                (F.col("digest") * sign).alias("digest"),
            )
        )
    else:
        both = bm.select(
            "bucket",
            (F.col("n_rows") * sign).alias("n_rows"),
            (F.col("digest") * sign).alias("digest"),
        )
    wrap = F.expr(f"CAST('{_WRAP}' AS DECIMAL(38,0))")
    merged = both.groupBy("bucket").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        # pmod keeps retracted digests in [0, 2^63) — subtraction can
        # go negative before the wrap; decimal keeps the sum exact
        F.pmod(F.sum(F.col("digest").cast("decimal(38,0)")), wrap)
        .cast("long")
        .alias("digest"),
    ).filter(F.col("n_rows") > 0)
    backend.replace(
        merged.coalesce(1), path, meta={"applied": int(batch_id)}
    )


def read_manifest(spark: SparkSession, state_dir: str, backend=None) -> DataFrame:
    """The live manifest (bucket, n_rows, digest) — compare with a
    batch ``corpus_manifest`` via ``manifest_diff``."""
    backend = backend or DEFAULT_BACKEND
    df = backend.read(spark, _path(state_dir))
    if df is None:
        raise ValueError(f"no manifest state at {state_dir}")
    return df


def incremental_manifest(
    records: DataFrame,
    state_dir: str,
    key_col: str,
    content_cols: list[str],
    backend=None,
    checkpoint: str | None = None,
):
    """Start the manifest fold; returns the StreamingQuery. Restart
    over existing state requires a checkpoint (reset batch ids would
    skip folds against the meta's applied high-water)."""
    if checkpoint is None:
        meta = (backend or DEFAULT_BACKEND).read_meta(_path(state_dir)) or {}
        if int(meta.get("applied", -1)) >= 0:
            raise ValueError(
                f"state dir {state_dir!r} holds a previous run's "
                "applied-batch meta; restarting without a checkpoint would "
                "reset batch ids to 0 and silently skip every batch the "
                "meta already covers — pass checkpoint= or use a fresh "
                "state dir"
            )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_manifest_batch(
            batch_df, batch_id, state_dir, key_col, content_cols, 1,
            N_BUCKETS, backend,
        )

    w = records.writeStream.outputMode("append").foreachBatch(_sink)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()

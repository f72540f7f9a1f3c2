"""Streaming approximate-nearest-neighbor probe — similarity search
deployed on a live query stream against a FROZEN IVF index.

The production ANN shape is asymmetric: the corpus index is built (and
re-built) in batch — k-means centroids plus the cell-assigned corpus,
both persisted — while queries arrive continuously and must be scored
NOW, against the index as-frozen. That is the same export/score split
as BM25's frozen-stats scorer and q116's frozen quality cutoffs:

- train once:   ``operators.similarity.ivf_train`` → centroid artifact
                (``save_centroids``/``load_centroids`` round-trips it
                as JSON); ``ivf_index`` → cell-assigned corpus,
                persisted as plain parquet (partition by ``cell`` to
                make the probe join partition-pruned).
- score always: each micro-batch runs ``ivf_probe`` VERBATIM against
                the static index — the scoring half touches no
                training state, so batch and stream results for the
                same query set are byte-identical by shared code path
                (pinned in tests/test_streaming_ann.py).

foreachBatch (not a stream-static join followed by ranking): the
per-query top-k needs a ranking window over the candidate set, which
append-mode streaming cannot express without a watermark the query
stream doesn't have; inside foreachBatch the micro-batch is a plain
DataFrame, so the identical batch kernel runs unchanged. Appends are
idempotent per (batch_id); ``read_ann_results`` dedups replays by
(batch_id, query_id, rank).

Refreshing the index is a blue/green swap: build the new (centroids,
index) pair in batch, then restart the probe query pointing at the
new artifacts — the stream itself holds no state to migrate
(``state_dir`` only accumulates results and the replay marker).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ivf_probe
from ._state import DEFAULT_BACKEND, applied_batch, commit_marker, run_marker


def _results_path(state_dir: str) -> str:
    return os.path.join(state_dir, "results")


def probe_ann_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    centroids,
    index: DataFrame,
    k: int,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend=None,
    marker: str = "_applied_batch",
) -> None:
    """Score one micro-batch of query vectors with the batch
    ``ivf_probe`` kernel and append the ranked neighbors."""
    if batch_id <= applied_batch(state_dir, marker):
        return
    backend = backend or DEFAULT_BACKEND
    out = ivf_probe(
        batch_df, centroids, index, k, n_probe, id_col, vec_col
    ).withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
    backend.append(out.coalesce(8), _results_path(state_dir), None)
    commit_marker(state_dir, batch_id, marker)


def ann_probe_stream(
    queries: DataFrame,
    state_dir: str,
    centroids,
    index: DataFrame,
    k: int,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend=None,
    checkpoint: str | None = None,
):
    """Start the streaming ANN probe; returns the StreamingQuery.
    Pass ``checkpoint`` (a Structured Streaming checkpointLocation)
    when the query must survive restarts — the blue/green index swap
    restarts the probe against new artifacts and the checkpoint is
    what lets the restarted query resume the source offsets instead
    of replaying from scratch. WITHOUT a checkpoint the replay marker
    is scoped to THIS run (see ``_state.run_marker``): a restarted
    query's batch ids reset to 0, and a durable marker would silently
    mask every post-restart batch (r12 ADVICE) — the per-run marker
    reprocesses instead, and ``read_ann_results``'s dedup collapses
    the duplicate appends."""
    marker = run_marker(checkpoint)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        probe_ann_batch(
            batch_df,
            batch_id,
            state_dir,
            centroids,
            index,
            k,
            n_probe,
            id_col,
            vec_col,
            backend,
            marker,
        )

    w = queries.writeStream.outputMode("append").foreachBatch(_sink)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


def probe_lsh_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    base: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend=None,
    marker: str = "_applied_batch",
) -> None:
    """Score one micro-batch of query vectors against a FROZEN LSH
    base (``lsh_bucketize_self`` / ``load_lsh_base``) with the batch
    ``lsh_topk`` kernel — the query side is bucketized per batch with
    the same deterministic md5-seeded hyperplanes, so batch and stream
    results agree by shared code path, exactly like the IVF probe."""
    from ..operators.similarity import lsh_topk

    if batch_id <= applied_batch(state_dir, marker):
        return
    backend = backend or DEFAULT_BACKEND
    out = lsh_topk(
        batch_df,
        None,
        k,
        dim,
        id_col=id_col,
        vec_col=vec_col,
        n_planes=n_planes,
        n_tables=n_tables,
        base=base,
    ).withColumn("batch_id", F.lit(int(batch_id)).cast("bigint"))
    backend.append(out.coalesce(8), _results_path(state_dir), None)
    commit_marker(state_dir, batch_id, marker)


def lsh_probe_stream(
    queries: DataFrame,
    state_dir: str,
    base: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backend=None,
    checkpoint: str | None = None,
):
    """Start the streaming LSH ANN probe against a frozen bucketized
    base; returns the StreamingQuery. Index refresh is the same
    blue/green swap as the IVF probe: rebuild the base in batch
    (``save_lsh_base``), restart the query pointing at the new
    artifact — the stream holds no state to migrate. Uncheckpointed
    restarts get a per-run replay marker (``_state.run_marker``) so a
    stale durable marker cannot silently mask the restarted run's
    reset batch ids; pass ``checkpoint`` for offset-resuming restarts."""
    marker = run_marker(checkpoint)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        probe_lsh_batch(
            batch_df,
            batch_id,
            state_dir,
            base,
            k,
            dim,
            n_planes,
            n_tables,
            id_col,
            vec_col,
            backend,
            marker,
        )

    w = queries.writeStream.outputMode("append").foreachBatch(_sink)
    if checkpoint is not None:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()


def read_ann_results(spark: SparkSession, state_dir: str, backend=None) -> DataFrame:
    """Ranked neighbors accumulated so far; replay duplicates are
    identical rows (the probe is deterministic against the frozen
    index), dropped by (batch_id, query_id, rank)."""
    raw = (backend or DEFAULT_BACKEND).read(spark, _results_path(state_dir))
    return raw.dropDuplicates(["batch_id", "query_id", "rank"])

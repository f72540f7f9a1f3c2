"""Coreset / diversity selection: greedy k-center over an embedding
column (Gonzalez 1985 farthest-point traversal; the coreset selector
of Sener & Savarese 2018) — the data-PRUNING complement of the dedup
family: instead of removing near-duplicates, pick the k most
MUTUALLY-DISTANT representatives, with a 2-approximation guarantee on
the covering radius.

Distributed shape: the per-row state is ONE double (the squared
distance to the nearest chosen center). Each round broadcasts the
newly chosen center inside an Arrow-batched kernel, folds the running
minimum in one narrow pass, and picks the next center with a
distributed TakeOrdered (argmax of the min-distance, id tiebreak) —
a k-row driver action per round, never a corpus collect. Cost is k
corpus passes (the greedy algorithm's honest price); each round's
state frame is persisted and the predecessor released, so lineage
stays flat. At 100 TB you run this on a JL-projected or PQ-compressed
view first (both in this repo) and k-center the survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcenter_select(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center selection: (center_id, sel_rank, radius) — the
    k chosen representatives in selection order, each with the
    covering radius AT its selection (the corpus max-min-distance the
    pick reduced; non-increasing by construction, and the final
    radius is within 2x of the optimal k-center covering radius).

    Deterministic: the seed is the minimum id, every argmax breaks
    ties by minimum id, and distances fold in numpy float64. Stops
    early when the corpus is exhausted or fully covered (radius 0 —
    only exact duplicates remain)."""
    from pyspark import StorageLevel

    if k < 1:
        raise ValueError("k must be >= 1")
    base = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    seed = base.orderBy(F.asc("cid")).limit(1).collect()
    if not seed:
        raise ValueError("k-center selection over an empty corpus")
    centers = [(int(seed[0].cid), 1, float("inf"))]
    center_vec = list(seed[0].cv)

    state = base.withColumn("d2", F.lit(float("inf")))
    state = state.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for rank in range(2, k + 1):
            from ..functions._pandas_udfs import make_center_d2_udf

            d2_udf = make_center_d2_udf(center_vec)
            nxt_state = state.withColumn(
                "d2", F.least(F.col("d2"), d2_udf(F.col("cv")))
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt_state.count()
            state.unpersist()
            state = nxt_state
            # distributed TakeOrdered: per-partition top-1, driver
            # merges partition winners — a bounded action
            far = (
                state.filter(~F.col("cid").isin([c[0] for c in centers]))
                .orderBy(F.desc("d2"), F.asc("cid"))
                .limit(1)
                .collect()
            )
            if not far or far[0].d2 <= 0.0:
                break
            centers.append((int(far[0].cid), rank, float(far[0].d2) ** 0.5))
            center_vec = list(far[0].cv)
    finally:
        state.unpersist()
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(cid, r, (None if rad == float("inf") else round(rad, 6))) for cid, r, rad in centers],
        "center_id long, sel_rank int, radius double",
    )

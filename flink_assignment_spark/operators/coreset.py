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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _center_d2_expr(v: Column, center) -> Column:
    """Squared L2 distance to a literal center as a higher-order-
    function fold (zip_with + aggregate) — left-associated float64,
    bit-identical to the sequential numpy fold the reference test
    computes. The HOF form (not a dot_fixed-style flat dim-term tree)
    is deliberate HERE: the loop re-plans every round with fresh
    literals, and a 64-term generated-code chain pays whole-stage
    codegen COMPILATION per round (measured 6.9 s for k=12 at sf0.1
    vs 4.1 s for the Arrow-UDF form it replaced) — the HOF keeps the
    generated class small, so per-round cost collapses to the scan
    itself. Interpreted per-row eval only matters when rows, not
    rounds, dominate — then dot_fixed's tradeoff applies."""
    c = F.array(*[F.lit(float(x)) for x in center])
    diffs = F.zip_with(
        v, c, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


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
            # a flat dim-term Catalyst expression (the dot_fixed
            # philosophy): whole-stage codegen compiles it to
            # straight-line Java, so each round is one JVM-only pass —
            # no Python-worker round-trip per iteration, which at
            # ~0.3 s each dominated the k-round loop
            d2_expr = _center_d2_expr(F.col("cv"), center_vec)
            nxt_state = state.withColumn(
                "d2", F.least(F.col("d2"), d2_expr)
            ).persist(StorageLevel.MEMORY_AND_DISK)
            # ONE job per round: the argmax action materializes the
            # persisted fold as it runs (distributed TakeOrdered —
            # per-partition top-1, driver merges partition winners, a
            # bounded action); only THEN release the predecessor, so
            # the fold read it from cache rather than replaying the
            # whole UDF chain from the base lineage
            far = (
                nxt_state.filter(~F.col("cid").isin([c[0] for c in centers]))
                .orderBy(F.desc("d2"), F.asc("cid"))
                .limit(1)
                .collect()
            )
            state.unpersist()
            state = nxt_state
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

"""Similarity search over embedding columns.

- :func:`cosine_topk` — brute-force top-k: query-set × corpus join
  with JVM-side double-precision cosine, ranked per query. The
  baseline and the verifier. With Q queries it is O(Q·N) — fine when
  Q is small or as a re-rank stage.
- :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH
  bucketing; queries only compare against corpus vectors sharing a
  bucket in ≥ 1 of ``n_tables`` hash tables. Approximate; recall
  grows with tables. Hyperplanes derive deterministically from
  md5-based hashes so results are reproducible across runs/engines.
- Embedding near-dup (corpus × corpus pairs ≥ threshold) is
  :func:`cosine_neardup_pairs`, same bucketing idea.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot, dot_fixed, make_pair_dot_udf, norm


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to session parallelism — pairwise
    similarity stages are compute-bound on tiny input bytes; without
    this a single small parquet file pins them to one task."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches
    excluded). Ranking key is (cosine rounded to 6, neighbor id) so
    ordering is total and engine-independent. Returns
    (query_id, neighbor_id, cos_sim, rank)."""
    # precompute norms row-side: bit-identical to computing them
    # per-pair (same operands, same op order), but the pairwise stage
    # shrinks to a single dot product — keeps the expression inside
    # whole-stage codegen's method-size limit
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col), dim).alias("qn"),
    )
    c = _spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col), dim).alias("cn"),
    )
    # the query side is small by construction — broadcast it so the
    # corpus never shuffles
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    pair_dot = make_pair_dot_udf()
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(pair_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_weight(table: int, plane: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1000, 1000],
    derived from md5 at plan-build time (no RNG state; identical for
    the oracle). Folded into the plan as a literal."""
    import hashlib

    h = int(hashlib.md5(f"lsh:{table}:{plane}:{d}".encode()).hexdigest()[:8], 16)
    return float(h % 2001 - 1000)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    n_tables: int = 16,
) -> DataFrame:
    """Approximate top-k: compare only bucket-colliding pairs.

    Each vector gets ``n_tables`` bucket ids (``n_planes`` sign bits
    each); queries and corpus equi-join on (table, bucket) — a plain
    shuffle join on a well-spread key — then exact cosine ranks
    candidates.

    Tuning: collision probability per table is (1 − θ/π)^n_planes.
    More planes → smaller buckets (faster, lower recall); more tables
    → higher recall (linear cost). The 4×16 default gives ~0.85
    recall@5 on the test embeddings, whose true neighbors are far
    (cos ≈ 0.3–0.5); corpora with genuine near-duplicates can afford
    8+ planes.
    """
    import numpy as np

    from ..functions._pandas_udfs import make_lsh_buckets_udf

    weights = np.array(
        [
            [[plane_weight(t, p, d) for d in range(dim)] for p in range(n_planes)]
            for t in range(n_tables)
        ],
        dtype=np.float64,
    )
    buckets_udf = make_lsh_buckets_udf(weights)

    def bucketize(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias))
            .withColumn("__buckets", buckets_udf(F.col(vec_alias)))
            .select(
                id_alias,
                vec_alias,
                F.posexplode("__buckets").alias("tbl", "bkt"),
            )
        )

    qb = bucketize(queries, "query_id", "qv")
    cb = bucketize(corpus, "neighbor_id", "cv")
    cand = (
        qb.join(cb, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv"), dim), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All corpus pairs with cosine ≥ threshold (id_a < id_b).

    Brute-force pair generation (the oracle-checkable form); at scale
    swap the pair source for the LSH bucket join above — the scoring
    and threshold stage is identical.
    """
    a = _spread(vectors).select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"),
        norm(F.col(vec_col), dim).alias("na"),
    )
    b = vectors.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"),
        norm(F.col(vec_col), dim).alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    pair_dot = make_pair_dot_udf()
    return (
        pairs.select(
            "vec_a", "vec_b",
            F.round(pair_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )

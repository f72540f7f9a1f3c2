"""Iterative graph algorithms over edge DataFrames.

Connected components (operators/components.py) already covers the
dedup-cluster use; this module adds WEIGHTED PAGERANK (Page et al.
1999) — the influence/authority score a curation pipeline uses to
weight sources and domains (web-graph authority is a classic quality
prior for pretraining data, e.g. the harmonic-centrality filter in
Common Crawl pipelines).

Exactness across engines is the design constraint: float PageRank
sums contributions in shuffle order, so two engines (or two runs)
disagree in the last ulps and a value-hash oracle can never pass.
This implementation is INTEGER PageRank: ranks live in integer
``scale`` units (default 1e9), every per-edge contribution is an
integer floor division, and every aggregate is an integer SUM —
order-free, so the result is a pure function of the graph, identical
in Spark and DuckDB (the repo's exact-integer rule, applied to an
iterative algorithm):

    r0(v)   = scale DIV n
    contrib = (r(u) * damping_pct * w(u,v)) DIV (100 * W(u))
    dang    = Σ r(u) over nodes with no out-edges
    r'(v)   = ((100 - damping_pct) * scale DIV 100) DIV n
              + dang * damping_pct DIV (100 * n)
              + Σ_in contrib

All quantities are non-negative, so Spark's ``DIV`` (truncate) and
DuckDB's ``//`` (floor) agree. Totals drift slightly below ``scale``
from floor remainders — deterministically, by the same amount in both
engines.

Scale shape: one broadcast-ready node table (ranks: |V| rows) joined
per iteration against the edge table on ``src`` — at web scale the
edges are hash-partitioned by src ONCE and every iteration reuses
that partitioning (one shuffle for the per-dst aggregation per
iteration, none for the join when ranks broadcast or co-partition);
the iteration count is a fixed small constant, so the whole plan is
k joins + k aggregates, no driver-side data loops (only the bounded
iteration loop itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**9


def weighted_pagerank(
    edges: DataFrame,
    n_iters: int = 5,
    damping_pct: int = 85,
    scale: int = PR_SCALE,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = "weight",
) -> DataFrame:
    """Integer weighted PageRank after ``n_iters`` synchronous
    iterations. ``edges``: (src, dst[, weight]) — parallel edges are
    legal (weights add); ``weight=None`` treats every edge as 1.
    Returns ``(node, rank)`` with ``rank`` in ``scale`` units.
    Deterministic: every step is integer arithmetic under SUM, so no
    fold-order sensitivity (the property that makes q155
    oracle-checkable)."""
    w_col = F.col(weight).cast("long") if weight is not None else F.lit(1).cast("long")
    # weights must be POSITIVE: a zero/negative-weight edge would put
    # a 0 (or negative) total out-weight in the divisor — Spark's DIV
    # returns NULL on /0 (silent rank-mass loss) while DuckDB's //
    # raises, a cross-engine divergence (r16 review). A non-positive
    # weight means "not an edge"; drop it up front.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
    ).filter(F.col("w") > 0)
    # collapse parallel edges ONCE, with each edge carrying its
    # source's TOTAL out-weight, and materialize via localCheckpoint
    # (not persist: the CacheManager matches canonicalized plans, so a
    # persisted scan of a state path would serve STALE cached data to
    # a later call after the path's files changed — the streaming
    # read_pagerank case; localCheckpoint gives each call a unique
    # materialized lineage). Baking w_out onto the edge row here
    # removes a per-iteration join + aggregate from the k-round loop
    # (guide §2.4: establish a partitioning/derived column once, reuse
    # it every round).
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    out_w = e.groupBy("src").agg(F.sum("w").alias("w_out"))
    e = e.join(out_w, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            e.select(F.col("src").alias("node"), "w_out").distinct(),
            "node",
            "left",
        )
        .localCheckpoint()
    )
    # |V| AND whether any dangling node exists, in the ONE setup job
    # the node count already cost (both bounded scalars, not data).
    # A dangling-free graph — every node has out-edges, e.g. the
    # nation trade graph — has dang == 0 in EVERY iteration by
    # construction, so the loop below can skip the per-iteration
    # checkpoint + dangling-mass collect entirely and stay LAZY: the
    # k-iteration plan executes as one job at the consumer's action
    # (e and nodes are LogicalRDD leaves, so the tree is k joins +
    # k aggregates — linear, planned once). Rank values are identical
    # (dang_share = 0 is exactly what the collect would return).
    stats = nodes.agg(
        F.count("*"),
        F.coalesce(F.sum(F.when(F.col("w_out").isNull(), 1)), F.lit(0)),
    ).collect()[0]
    n, has_dangling = int(stats[0]), int(stats[1]) > 0
    d = int(damping_pct)
    base = ((100 - d) * scale // 100) // n

    # ranks carry the w_out null-marker so the per-iteration dangling
    # aggregate reads ONE cached frame instead of re-joining nodes
    ranks = nodes.select(
        "node", "w_out", F.lit(scale // n).cast("long").alias("rank")
    )
    for _ in range(n_iters):
        if has_dangling:
            # ONE job per iteration, flat lineage: the LAZY
            # localCheckpoint truncates the logical plan immediately
            # (every downstream plan sees a LogicalRDD, not the k-deep
            # iteration tree — an eager persist() chain measured a
            # 101 KB final plan whose per-round re-optimization ate
            # the job savings), and the dangling-mass aggregate (a
            # bounded scalar, not data) is the action that
            # materializes it — the former shape paid a checkpoint
            # job AND a separate dangling collect job per round. The
            # per-round driver round-trip is unavoidable here: the
            # mass is a data-dependent scalar the next plan needs as
            # a literal (the in-plan alternative is a constant-key
            # join, which plans as the banned nested loop — r16).
            ranks = ranks.localCheckpoint(eager=False)
            dang = ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("w_out").isNull(), F.col("rank"))), F.lit(0)
                ).cast("long")
            ).collect()[0][0]
            dang_share = int(dang) * d // (100 * n)
        else:
            dang_share = 0
        contrib = (
            e.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * {d} * w) DIV (100 * w_out)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").cast("long").alias("in_sum"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            "w_out",
            (
                F.lit(base).cast("long")
                + F.lit(int(dang_share)).cast("long")
                + F.coalesce(F.col("in_sum"), F.lit(0))
            ).alias("rank"),
        )
    return ranks.select("node", "rank")

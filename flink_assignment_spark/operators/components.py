"""Connected components over a pair list (duplicate-cluster
resolution).

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (keep
one representative per transitively-connected group). This is
min-label propagation — the standard large-graph connected-components
algorithm (hash-min): every node starts labeled with its own id; each
round, a node takes the min label in its neighborhood; converges in
O(diameter) rounds.

Execution shape: a driver-side loop over DataFrame joins. Each round
is one shuffle join + aggregation (fully distributed); only the
CONVERGENCE CHECK (a count) runs on the driver. Rounds are
O(log n) for typical near-dup graphs (tiny diameters), so the loop
does not become a driver bottleneck at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


SMALL_GRAPH_EDGES = 500_000


def connected_components(
    pairs: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min
    node id reachable through the pair graph."""
    # cache the pair source first: both union branches (and every
    # propagation round) reference it, and Spark re-executes uncached
    # subtrees once per reference
    pairs = pairs.select(F.col(src_col).alias("pa"), F.col(dst_col).alias("pb")).cache()
    # Two-path design (size picked at runtime, the AQE idea applied to
    # an iterative algorithm): the pair graph holds only docs that HAVE
    # a near-dup — usually orders of magnitude smaller than the corpus.
    # Below the threshold the edge list is collected and resolved with
    # union-find on the driver (bounded memory by construction; zero
    # per-round stage scheduling). Above it, distributed min-label
    # propagation runs — O(diameter) rounds of one shuffle join each.
    if pairs.count() <= SMALL_GRAPH_EDGES:
        return _driver_union_find(pairs)
    edges = (
        pairs.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .union(pairs.select(F.col("pb").alias("a"), F.col("pa").alias("b")))
        .distinct()
        .cache()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        # localCheckpoint — NOT cache — because each round's plan embeds
        # the previous round's tree TWICE (labels appears on both join
        # inputs); with cache the lineage still nests and the logical
        # plan grows ~2^rounds, OOM-ing the driver on long-diameter
        # graphs just from plan-tree bookkeeping. Checkpointing cuts
        # the plan to a flat scan of materialized blocks every round.
        ).localCheckpoint(eager=True)
        changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return labels


def _driver_union_find(pairs: DataFrame) -> DataFrame:
    """Union-find over a collected (small) pair list; same result as
    min-label propagation: component = min reachable node id."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in pairs.collect():
        a, b = r["pa"], r["pb"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for node in parent:
        root = find(node)
        m = comp_min.get(root)
        comp_min[root] = node if m is None or node < m else m
    node_t = pairs.schema["pa"].dataType
    schema = StructType(
        [StructField("node", node_t), StructField("component", node_t)]
    )
    try:
        # Arrow fast path: a pandas frame uploads in columnar batches
        # (~10x faster than pickling row tuples at 500k+ nodes)
        import pandas as pd

        pdf = pd.DataFrame(
            {"node": list(parent), "component": [comp_min[find(n)] for n in parent]}
        )
        return pairs.sparkSession.createDataFrame(pdf, schema)
    except ImportError:
        rows = [(n, comp_min[find(n)]) for n in parent]
        return pairs.sparkSession.createDataFrame(rows, schema)


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Duplicate clusters from near-dup pairs: every clustered doc with
    its cluster representative (min doc_id) and cluster size."""
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("keep_id"),
            "cluster_size",
        )
    )

"""Pins for the round-17 optimization internals: the dangling-free
PageRank fast path, and the single-expr builders whose parse trees
must stay node-identical to the Column forms they replaced."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.functions.vector import cosine, cosine_fixed
from flink_assignment_spark.operators.graph import PR_SCALE, weighted_pagerank


def _py_integer_pagerank(edges, n_iters=5, d=85, scale=PR_SCALE):
    """The module docstring's integer recurrence, in plain Python."""
    from collections import defaultdict

    w = defaultdict(int)
    for s, t, ww in edges:
        if ww > 0:
            w[(s, t)] += ww
    out_w = defaultdict(int)
    for (s, _t), ww in w.items():
        out_w[s] += ww
    nodes = sorted({s for s, _ in w} | {t for _, t in w})
    n = len(nodes)
    base = ((100 - d) * scale // 100) // n
    rank = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        dang = sum(rank[v] for v in nodes if v not in out_w)
        dang_share = dang * d // (100 * n)
        contrib = defaultdict(int)
        for (s, t), ww in w.items():
            contrib[t] += (rank[s] * d * ww) // (100 * out_w[s])
        rank = {v: base + dang_share + contrib.get(v, 0) for v in nodes}
    return rank


def test_pagerank_dangling_free_fast_path_matches_reference(spark):
    # every node has an out-edge -> the lazy (no per-iteration job)
    # fast path runs; values must match the integer recurrence exactly
    edges = [(1, 2, 3), (2, 3, 1), (3, 1, 2), (2, 1, 4), (1, 3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.rank for r in weighted_pagerank(df, n_iters=5).collect()}
    assert got == _py_integer_pagerank(edges)


def test_pagerank_dangling_free_runs_no_per_iteration_jobs(spark):
    # on a dangling-free graph the loop stays lazy: BUILD-time job
    # count is the setup cost alone and must NOT scale with the
    # iteration count (the dangling path pays one collect per round)
    sc = spark.sparkContext

    def build_jobs(n_iters):
        edges = [(1, 2, 1), (2, 1, 1)]
        df = spark.createDataFrame(edges, "src long, dst long, weight long")
        j0 = sc._jsc.sc().dagScheduler().numTotalJobs()
        ranks = weighted_pagerank(df, n_iters=n_iters)  # build, no action
        return sc._jsc.sc().dagScheduler().numTotalJobs() - j0, ranks

    j5, ranks5 = build_jobs(5)
    j10, _ = build_jobs(10)
    assert j10 == j5, (j5, j10)
    got = {r.node: r.rank for r in ranks5.collect()}
    assert got == _py_integer_pagerank([(1, 2, 1), (2, 1, 1)])


def test_pagerank_dangling_graph_still_exact(spark):
    # 2 is dangling -> the per-iteration collect path runs; exactness
    # against the same reference recurrence
    edges = [(1, 2, 2), (3, 2, 1), (3, 1, 1)]
    df = spark.createDataFrame(edges, "src long, dst long, weight long")
    got = {r.node: r.rank for r in weighted_pagerank(df, n_iters=4).collect()}
    assert got == _py_integer_pagerank(edges, n_iters=4)


def test_cosine_fixed_expr_is_bit_identical_to_column_form(spark):
    df = spark.range(50).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: F.pmod(F.xxhash64(F.col("id"), d), F.lit(997)) / 499.0 - 1.0,
        ).cast("array<double>").alias("a"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda d: F.pmod(F.xxhash64(F.col("id"), d, F.lit(7)), F.lit(991)) / 495.0 - 1.0,
        ).cast("array<double>").alias("b"),
    )
    both = df.select(
        cosine(F.col("a"), F.col("b"), 16).alias("col_form"),
        cosine_fixed("a", "b", 16).alias("expr_form"),
    ).collect()
    for r in both:
        # bit-identical, not approximately equal: same op order
        assert r.col_form == r.expr_form


def test_simhash_expr_fingerprints_bit_identical_to_column_form(spark):
    from flink_assignment_spark.functions.text import hash60, tokens
    from flink_assignment_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i} delta epsilon {i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash_fingerprints(docs).collect()}

    # the pre-r17 column-by-column form, reconstructed verbatim
    tok = (
        docs.select(
            "doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")
        )
        .filter(F.col("tok").isNotNull())
        .withColumn("h", hash60(F.col("tok")))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    summed = tok.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(SIMHASH_BITS):
        bit = F.when(
            F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp + bit
    want = {
        r.doc_id: r.simhash
        for r in summed.select("doc_id", fp.alias("simhash")).collect()
    }
    assert got == want

"""knn_topk's per-group candidate pruning is EXACT: multi-block runs
(heavy cross-group pruning) must equal the exhaustive all-pairs
reference row-for-row, including under adversarial ties — duplicate
vectors (cosine exactly 1.0 across block boundaries) and
sub-rounding perturbations (raw cosines that differ by < 1e-6 and
collide at round-6, where only the id tie-break orders them). This is
the slack-band sufficiency claim from make_self_block_topk_scorer's
docstring, pinned in CI."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_assignment_spark.operators.similarity import (
    cosine_neardup_pairs,
    knn_label_purity,
    knn_topk,
)

K = 3


def _vectors(spark):
    """41 4-dim vectors: 3 exact-duplicate families (ids spread so
    duplicates land in DIFFERENT blocks at block_rows=5), a family of
    1e-9 perturbations (round-6 cosine ties without raw equality),
    and a spread remainder."""
    rows = []
    for i in range(41):
        fam = i % 3
        if i < 12:  # duplicate families: vector depends only on i%3
            v = [float(fam + 1), 2.0, float(3 - fam), 1.0]
        elif i < 18:  # near-duplicates of family 0, sub-rounding apart
            v = [1.0 + (i - 11) * 1e-9, 2.0, 3.0, 1.0]
        else:  # spread tail
            v = [float((i * 7) % 11 + 1), float((i * 5) % 7 + 1),
                 float((i * 3) % 5 + 1), float(i % 4 + 1)]
        rows.append((i, v, fam))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def _exhaustive_topk(vectors, k):
    """Reference: emit EVERY scored pair (no pruning) into the same
    ranking window — the shape knn_topk must equal."""
    pairs = cosine_neardup_pairs(vectors, threshold=-2.0, block_rows=1_000_000)
    sym = pairs.select(
        F.col("vec_a").alias("query_id"),
        F.col("vec_b").alias("neighbor_id"),
        "cos_sim",
    ).unionByName(
        pairs.select(
            F.col("vec_b").alias("query_id"),
            F.col("vec_a").alias("neighbor_id"),
            "cos_sim",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return sym.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def test_multiblock_pruned_equals_exhaustive(spark):
    vectors = _vectors(spark)
    expected = sorted(map(tuple, _exhaustive_topk(vectors, K).collect()))
    got = sorted(map(tuple, knn_topk(vectors, K, block_rows=5).collect()))
    assert len(got) == 41 * K
    assert got == expected


def test_single_block_equals_multiblock(spark):
    """Block geometry must be invisible: one giant group (no pruning
    risk) and 9 small blocks (maximal pruning) agree row-for-row."""
    vectors = _vectors(spark)
    one = sorted(map(tuple, knn_topk(vectors, K, block_rows=1_000_000).collect()))
    many = sorted(map(tuple, knn_topk(vectors, K, block_rows=5).collect()))
    assert one == many


def test_purity_block_rows_invariant(spark):
    vectors = _vectors(spark)
    a = sorted(map(tuple, knn_label_purity(vectors, k=K, block_rows=5).collect()))
    b = sorted(
        map(tuple, knn_label_purity(vectors, k=K, block_rows=1_000_000).collect())
    )
    assert a == b
    # sane report: all three labels present, purities in [0, 1]
    # (the near-duplicate family deliberately injects mixed labels
    # into family 0's neighborhoods, so purity < 1.0 is expected)
    assert {r[0] for r in a} == {0, 1, 2}
    assert all(0.0 <= r[3] <= 1.0 for r in a)


def test_hard_negatives_matches_numpy_naive(spark):
    """The slack-band in-kernel top-k equals a naive full-matrix
    computation, including label edge cases: a query whose label no
    corpus row shares (every row is a candidate) and one sharing a
    label with everything (zero candidate rows)."""
    import numpy as np

    from flink_assignment_spark.operators.similarity import hard_negatives

    rng = [(i,
            [((i * 37 + d * 11) % 19 - 9) / 9.0 for d in range(6)],
            (i % 3))
           for i in range(40)]
    # id 40: unique label 7; id 41 (query only) labeled 9 shares with nobody
    rng.append((40, [0.5, -0.2, 0.1, 0.9, -0.4, 0.3], 7))
    corpus = spark.createDataFrame(rng, "vec_id long, embedding array<double>, label int")
    queries = corpus.filter("vec_id < 6 OR vec_id = 40")

    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in hard_negatives(queries, corpus, k=4).collect()
    }

    ids = np.array([r[0] for r in rng])
    M = np.array([r[1] for r in rng], dtype=np.float64)
    labels = np.array([r[2] for r in rng])
    norms = np.sqrt((M * M).sum(axis=1))
    want = {}
    for qi in list(range(6)) + [40]:
        q = M[ids == qi][0]
        cos = np.round((M @ q) / (norms * np.sqrt((q * q).sum())), 6)
        cand = [
            (-c, i, c)
            for c, i, l in zip(cos, ids, labels)
            if l != labels[ids == qi][0]
        ]
        for rank, (_, nid, c) in enumerate(sorted(cand)[:4], start=1):
            want[(qi, rank)] = (int(nid), float(c))
    assert got == want
    # the unique-label query ranks against the WHOLE corpus
    assert sum(1 for (q, _) in got if q == 40) == 4


def test_hard_negatives_all_same_label_is_empty(spark):
    from flink_assignment_spark.operators.similarity import hard_negatives

    df = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 0.5], 1) for i in range(10)],
        "vec_id long, embedding array<double>, label int",
    )
    assert hard_negatives(df.filter("vec_id < 2"), df, k=3).count() == 0

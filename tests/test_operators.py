"""Operator-level tests: physical-strategy equivalence and
approximate-operator recall."""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_assignment_spark.operators.interval_join import (
    bucketed_interval_join,
    interval_join,
)
from flink_assignment_spark.operators.similarity import cosine_topk, lsh_topk
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR

BASE = datetime(2024, 5, 1, tzinfo=timezone.utc)

ROW_SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ts", TimestampType()),
        StructField("v", IntegerType()),
    ]
)


def _df(spark, rows, prefix):
    return spark.createDataFrame(
        [(k, BASE + timedelta(seconds=s), v) for k, s, v in rows], ROW_SCHEMA
    ).select(F.col("k"), F.col("ts").alias(f"{prefix}_ts"), F.col("v").alias(f"{prefix}_v"))


# strategy: small keyed event sets with second-granularity offsets that
# land on, inside, and outside the band edges
_row = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=-7200, max_value=7200),
    st.integers(min_value=0, max_value=9),
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(left=st.lists(_row, max_size=12), right=st.lists(_row, max_size=12))
def test_bucketed_equals_plain_interval_join(spark, left, right):
    """The scale-path bucketed join must return EXACTLY the rows of the
    plain band join, for any inputs (including band-edge timestamps)."""
    ldf, rdf = _df(spark, left, "l"), _df(spark, right, "r")
    args = (["k"], "l_ts", "r_ts", -3600, 1800)
    plain = Counter(tuple(r) for r in interval_join(ldf, rdf, *args).collect())
    bucketed = Counter(
        tuple(r)
        for r in bucketed_interval_join(ldf, rdf, *args)
        .select(*[c for c in interval_join(ldf, rdf, *args).columns])
        .collect()
    )
    assert plain == bucketed


def test_band_edges_inclusive(spark):
    """Both band bounds are inclusive (reference intervalJoin.between
    semantics, FlinkAssignment.scala:276-277)."""
    ldf = _df(spark, [("a", 0, 1)], "l")
    rdf = _df(
        spark,
        [("a", -3600, 1), ("a", -3601, 2), ("a", 1800, 3), ("a", 1801, 4)],
        "r",
    )
    got = {r.r_v for r in interval_join(ldf, rdf, ["k"], "l_ts", "r_ts", -3600, 1800).collect()}
    assert got == {1, 3}
    got_b = {
        r.r_v
        for r in bucketed_interval_join(ldf, rdf, ["k"], "l_ts", "r_ts", -3600, 1800).collect()
    }
    assert got_b == {1, 3}


def test_lsh_topk_recall(spark):
    """LSH top-k is approximate; with the default 16 tables × 4 planes
    on the test embeddings it must recover a solid majority of the
    true top-5 neighbors (and every returned pair's cosine must be
    exact)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(queries, emb, k=5, dim=64)
    approx = lsh_topk(queries, emb, k=5, dim=64)
    exact_pairs = {(r.query_id, r.neighbor_id): r.cos_sim for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id): r.cos_sim for r in approx.collect()}
    hits = set(exact_pairs) & set(approx_pairs)
    recall = len(hits) / len(exact_pairs)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    for p in hits:  # scores must agree exactly where both returned the pair
        assert exact_pairs[p] == approx_pairs[p]


def test_ivf_topk_recall(spark):
    """IVF at default 8 cells / 4 probes must recover most of the exact
    top-5, with exact cosine scores on returned pairs."""
    from flink_assignment_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id): r.cos_sim for r in cosine_topk(queries, emb, k=5, dim=64).collect()}
    approx = {(r.query_id, r.neighbor_id): r.cos_sim for r in ivf_topk(queries, emb, k=5).collect()}
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= 0.6, f"IVF recall too low: {recall}"
    for p in hits:
        assert exact[p] == approx[p]

    # determinism: identical output across runs (seedless k-means)
    again = {(r.query_id, r.neighbor_id): r.cos_sim for r in ivf_topk(queries, emb, k=5).collect()}
    assert approx == again

"""Focused pins for the round-16 OPTIMIZATION changes — each asserts
the behavior-preserving property the optimization relies on, not the
speed (speeds are recorded in OPTIMIZATION_r16.md via the paired A/B
harness).

- loaders schema memo: warm loads see the identical schema/semantics
  a cold inference produces, and a rewritten file invalidates the memo.
- blocked all-pairs parallelism floor: the block count rises for
  small corpora (no more single-group scans) while every unordered id
  pair still lives in exactly one group, so results are invariant.
- BPE trainer one-pass-per-round restructure and the pagerank
  iteration fold are pinned by their existing parity/oracle tests
  (tests/test_bpe.py, test_round16_properties.py::
  test_weighted_pagerank_properties, tests/test_streaming_pagerank.py);
  this file adds only what those do not cover.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.sources import loaders
from tests.conftest import SF_DIR


def test_load_table_memo_warm_equals_cold(spark):
    loaders._SCHEMA_MEMO.clear()
    for name in ("events", "lineitem", "documents", "nation"):
        cold = loaders.load_table(spark, SF_DIR, name)
        assert any(k[0].endswith(f"{name}.parquet") for k in loaders._SCHEMA_MEMO)
        warm = loaders.load_table(spark, SF_DIR, name)
        assert warm.schema == cold.schema
        assert warm.count() == cold.count()
    # events semantics survive the warm path: ts is a real timestamp
    ev = loaders.load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_load_table_memo_invalidates_on_rewrite(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = os.path.join(str(tmp_path), "widget.parquet")
    pq.write_table(pa.table({"a": [1, 2, 3]}), p)
    df1 = loaders.load_table(spark, str(tmp_path), "widget")
    assert [f.name for f in df1.schema.fields] == ["a"]
    # rewrite the file with a DIFFERENT schema: the (path, mtime, size)
    # key must miss and re-infer — a stale memo would misread the file
    os.remove(p)
    pq.write_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}), p)
    os.utime(p, (1, 1))  # force a distinct stat signature either way
    df2 = loaders.load_table(spark, str(tmp_path), "widget")
    assert [f.name for f in df2.schema.fields] == ["a", "b"]
    assert df2.count() == 3


def _pairs_cover_exactly_once(spark, n_rows: int, block_rows: int):
    from flink_assignment_spark.operators.similarity import (
        _self_block_pairs_exploded,
    )

    vecs = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.col("id").cast("double")).alias("embedding"),
    )
    ex = _self_block_pairs_exploded(vecs, "vec_id", "embedding", block_rows)
    # group sizes: number of distinct blocks per (gi, gj) group
    rows = ex.select("_id", "_blk", "gi", "gj").collect()
    n_blocks = max(r._blk for r in rows) + 1
    # every unordered id pair must co-occur in EXACTLY one group
    from collections import defaultdict

    by_group = defaultdict(set)
    for r in rows:
        by_group[(r.gi, r.gj)].add(r._id)
    blk_of = {r._id: r._blk for r in rows}
    seen = {}
    for g, ids in by_group.items():
        for a in ids:
            for b in ids:
                if a < b:
                    # a pair is SCORED only in the group equal to its
                    # own two blocks (same-block pairs co-occur in
                    # every (blk, q) group but the kernel scores them
                    # in (blk, blk) alone) — count it there only, so
                    # the assertion below is the real exactly-once
                    # invariant, not >= 1 (r16 ADVICE)
                    ba, bb = blk_of[a], blk_of[b]
                    if (min(ba, bb), max(ba, bb)) == g:
                        seen[(a, b)] = seen.get((a, b), 0) + 1
    for a in range(n_rows):
        for b in range(a + 1, n_rows):
            assert seen.get((a, b), 0) == 1, (a, b, seen.get((a, b), 0))
    return n_blocks


def test_block_floor_raises_parallelism_on_small_corpora(spark):
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # 900 rows at block_rows=2048 used to collapse to ONE block; the
    # floor must now split it (bounded by the 256-row block minimum)
    n_blocks = _pairs_cover_exactly_once(spark, 900, 2048)
    if par >= 4:
        assert n_blocks >= 2
    assert n_blocks <= max(1, 900 // 256) or n_blocks == 1


def test_block_floor_keeps_tiny_corpora_single_block(spark):
    # under 2x256 rows there is nothing to split without starving the
    # Arrow batches — the floor must stay inert
    n_blocks = _pairs_cover_exactly_once(spark, 60, 2048)
    assert n_blocks == 1


def test_neardup_pairs_invariant_to_block_count(spark):
    from flink_assignment_spark.operators.similarity import cosine_neardup_pairs

    vec = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda d: F.pmod(F.xxhash64(F.col("vec_id"), d), F.lit(1000)) / 500.0 - 1.0,
    )
    vecs = spark.range(300).select(
        F.col("id").alias("vec_id"), vec.cast("array<double>").alias("embedding")
    )
    got = {
        block_rows: sorted(
            (r.vec_a, r.vec_b, r.cos_sim)
            for r in cosine_neardup_pairs(
                vecs, threshold=0.4, block_rows=block_rows
            ).collect()
        )
        for block_rows in (2048, 64)
    }
    assert got[2048] == got[64]
    assert len(got[2048]) > 0

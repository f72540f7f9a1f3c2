"""Source-level robustness: corrupt-line quarantine and stream-static
enrichment."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.sources.loaders import read_commits_json_tolerant

from .commit_fixtures import make_commits, write_jsonl


def test_corrupt_json_quarantine(spark, tmp_path):
    """A malformed line must not abort the read (the reference's
    json4s parser throws, CommitParser.scala:19-21): good rows parse,
    bad raw lines land in the quarantine frame, counts add up."""
    p = str(tmp_path / "commits.jsonl")
    rows = make_commits(n=20)  # returns n + appended edge-case commits
    write_jsonl(rows, p)
    with open(p, "a") as f:
        f.write('{"sha": "truncated-json", "commit": {\n')
        f.write("not json at all\n")

    good, bad = read_commits_json_tolerant(spark, p)
    assert good.count() == len(rows)
    assert good.filter(F.col("sha").isNull()).count() == 0
    bad_lines = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert any("truncated-json" in (line or "") for line in bad_lines)


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    """Stream-static join: a streaming fact stream enriched by a
    broadcast dimension — no stream-stream state, no watermark needed;
    the dim is re-resolved per micro-batch. The standard pattern for
    dimension enrichment at ingest."""
    src = tmp_path / "src"
    src.mkdir()
    rows = [(1, "click"), (2, "view"), (3, "click")]
    spark.createDataFrame(rows, "event_id long, event_type string").coalesce(1).write.parquet(
        str(src / "f1")
    )
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1)], "event_type string, weight double"
    )
    stream = spark.readStream.schema("event_id long, event_type string").parquet(
        str(src) + "/*"
    )
    enriched = stream.join(F.broadcast(dim), "event_type")
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName("enriched_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.event_id, r.weight) for r in spark.sql("SELECT * FROM enriched_out").collect()}
    assert got == {(1, 1.0), (2, 0.1), (3, 1.0)}

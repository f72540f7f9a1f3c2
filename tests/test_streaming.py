"""Structured Streaming variants produce the same results as batch.

Harness: file sources + memory sink + ``processAllAvailable`` (the
standard synchronous drive for finite streams). Watermark-gated
append queries get a far-future sentinel row in a second file so the
watermark passes and closed windows flush — mirroring how the
reference's bounded files implicitly close all windows at EOF.
"""

from __future__ import annotations

import json
from collections import Counter
from datetime import datetime, timezone

import pytest

from flink_assignment_spark.queries import reference as R
from flink_assignment_spark.sources.loaders import read_commit_geo_json, read_commits_json
from flink_assignment_spark.streaming import (
    followed_by_stream,
    question_eight_join_stream,
    question_five_stream,
    question_one_stream,
    question_seven_stream,
    question_three_stream,
)
from flink_assignment_spark.streaming.sources import read_commit_geo_stream, read_commits_stream

from .commit_fixtures import make_commits, make_geo, write_jsonl

SENTINEL = {
    "node_id": "sentinel",
    "sha": "sentinel",
    "url": "https://api.github.com/repos/sentinel/x/commits/sentinel",
    "commit": {
        "author": {"name": "zz", "email": "z@z", "date": "2025-01-01T00:00:00Z"},
        "committer": {"name": "zz", "email": "z@z", "date": "2025-01-01T00:00:00Z"},
        "message": "watermark sentinel",
        "tree": {"sha": "t"},
        "comment_count": 0,
        "verification": {"verified": False, "reason": "-"},
    },
    "parents": [],
    "stats": None,
    "files": [],
}


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    # the reference's input contract is IN-ORDER event time
    # (AscendingTimestampExtractor, README.md:114) — replay the corpus
    # sorted by event time, split across two files/micro-batches
    commits = sorted(make_commits(), key=lambda c: c["commit"]["committer"]["date"])
    geo = make_geo(commits)
    cdir, gdir = d / "commits", d / "geo"
    cdir.mkdir(), gdir.mkdir()
    half = len(commits) // 2
    write_jsonl(commits[:half], str(cdir / "part1.jsonl"))
    write_jsonl(commits[half:] + [SENTINEL], str(cdir / "part2.jsonl"))
    write_jsonl(geo, str(gdir / "part1.jsonl"))
    return commits, geo, str(cdir), str(gdir)


def run_stream(df, mode: str, name: str):
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_q1_stream_matches_batch(spark, stream_dirs):
    commits, _, cdir, _ = stream_dirs
    run_stream(question_one_stream(read_commits_stream(spark, cdir)), "append", "q1s")
    got = Counter(r.sha for r in spark.sql("SELECT * FROM q1s").collect())
    want = Counter(r.sha for r in R.question_one(read_commits_json(spark, cdir)).collect())
    assert got == want


def test_q3_stream_final_counts(spark, stream_dirs):
    _, _, cdir, _ = stream_dirs
    run_stream(question_three_stream(read_commits_stream(spark, cdir)), "complete", "q3s")
    got = {(r.ext, r["count"]) for r in spark.sql("SELECT * FROM q3s").collect()}
    want = {
        (r.ext, r["count"])
        for r in R.question_three(read_commits_json(spark, cdir)).collect()
    }
    assert got == want


def test_q5_stream_complete(spark, stream_dirs):
    _, _, cdir, _ = stream_dirs
    run_stream(question_five_stream(read_commits_stream(spark, cdir)), "complete", "q5s")
    got = {(r.date, r["count"]) for r in spark.sql("SELECT * FROM q5s").collect()}
    want = {(r.date, r["count"]) for r in R.question_five(read_commits_json(spark, cdir)).collect()}
    assert got == want


def test_q7_stream_append_watermark(spark, stream_dirs):
    """Chained windowed aggregation in append mode: rows emit once the
    watermark (pushed by the sentinel in file 2) passes window end."""
    _, _, cdir, _ = stream_dirs
    stream = read_commits_stream(spark, cdir, max_files=1)
    run_stream(question_seven_stream(stream), "append", "q7s")
    got = {tuple(r) for r in spark.sql("SELECT * FROM q7s WHERE repo != 'sentinel/x'").collect()}
    want = {
        tuple(r)
        for r in R.question_seven(read_commits_json(spark, cdir)).collect()
        if r.repo != "sentinel/x"
    }
    assert len(want) > 0 and got == want


def test_q8_join_stream_eager_inner(spark, stream_dirs):
    commits, geo, cdir, gdir = stream_dirs
    joined = question_eight_join_stream(
        read_commits_stream(spark, cdir), read_commit_geo_stream(spark, gdir)
    )
    run_stream(joined, "append", "q8s")
    got = Counter(
        (r.continent, r.changes, r.joined_ts) for r in spark.sql("SELECT * FROM q8s").collect()
    )
    # batch equivalent of the join stage
    cdf, gdf = read_commits_json(spark, cdir), read_commit_geo_json(spark, gdir)
    from pyspark.sql import functions as F

    java_files = (
        cdf.select(F.col("commit.committer.date").alias("commit_ts"), "sha", F.explode("files").alias("f"))
        .filter(F.col("f.filename").isNotNull() & F.col("f.filename").endswith(".java"))
        .select("sha", "commit_ts", F.col("f.changes").alias("changes"))
    )
    geo_ev = gdf.select(F.col("sha").alias("geo_sha"), F.col("createdAt").alias("geo_ts"), "continent")
    batch = java_files.join(
        geo_ev,
        (F.col("sha") == F.col("geo_sha"))
        & (F.col("geo_ts") >= F.col("commit_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("geo_ts") <= F.col("commit_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("continent", "changes", F.greatest("commit_ts", "geo_ts").alias("joined_ts"))
    want = Counter((r.continent, r.changes, r.joined_ts) for r in batch.collect())
    assert len(got) > 0 and got == want


def test_followed_by_stream_cross_batch_state(spark, tmp_path):
    """A in micro-batch 1, B in micro-batch 2 → the match is found via
    persisted keyed state, proving cross-batch CEP semantics."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType, TimestampType

    schema = StructType(
        [
            StructField("user", StringType()),
            StructField("ts", TimestampType()),
            StructField("etype", StringType()),
        ]
    )

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%d %H:%M").replace(tzinfo=timezone.utc)

    d = tmp_path / "cep"
    d.mkdir()
    batch1 = [("u1", ts("2024-01-01 10:00"), "A"), ("u2", ts("2024-01-01 10:00"), "A")]
    batch2 = [
        ("u1", ts("2024-01-01 12:00"), "B"),   # within 1 day → match
        ("u2", ts("2024-01-03 12:00"), "B"),   # beyond 1 day → no match
        ("u3", ts("2024-01-03 13:00"), "B"),   # B without A → no match
    ]
    spark.createDataFrame(batch1, schema).write.parquet(str(d / "f1"))
    spark.createDataFrame(batch2, schema).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .withWatermark("ts", "0 seconds")
    )
    out = followed_by_stream(stream, ["user"], "ts", "etype", "A", "B", within_s=86400)
    run_stream(out, "append", "ceps")
    rows = spark.sql("SELECT * FROM ceps").collect()
    got = {(r.user, r.first_ts_us, r.second_ts_us) for r in rows}
    assert got == {
        ("u1", int(ts("2024-01-01 10:00").timestamp() * 1_000_000),
         int(ts("2024-01-01 12:00").timestamp() * 1_000_000))
    }


def test_q9_stream_matches_batch(spark, stream_dirs):
    """Full streaming CEP over the commit corpus equals batch Q9."""
    from flink_assignment_spark.streaming.queries import question_nine_stream

    commits, _, cdir, _ = stream_dirs
    run_stream(question_nine_stream(read_commits_stream(spark, cdir, max_files=1)), "append", "q9s")
    got = Counter((r.repo, r.filename) for r in spark.sql("SELECT * FROM q9s").collect())
    want = Counter(
        (r.repo, r.filename)
        for r in R.question_nine(read_commits_json(spark, cdir)).collect()
    )
    assert len(got) > 0 and got == want


def test_q3_update_mode_refinement_cadence(spark, stream_dirs):
    """Flink emits a refinement per element (README.md:86-92); Spark's
    update mode emits a refinement per micro-batch. Verify the cadence:
    with 2 input files as 2 batches, each key's count appears multiple
    times with increasing values, ending at the batch total."""
    _, _, cdir, _ = stream_dirs
    stream = read_commits_stream(spark, cdir, max_files=1)
    q = (
        question_three_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("q3u")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM q3u").collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r.ext, []).append(r["count"])
    final = {
        (r.ext, r["count"])
        for r in R.question_three(read_commits_json(spark, cdir)).collect()
    }
    # at least one intermediate refinement before the final value, and
    # the last refinement equals the batch result
    assert any(len(v) > 1 for v in per_key.values())
    assert {(k, max(v)) for k, v in per_key.items()} == final


def test_q2_stream_matches_batch(spark, stream_dirs):
    from flink_assignment_spark.streaming.queries import question_two_stream

    _, _, cdir, _ = stream_dirs
    run_stream(question_two_stream(read_commits_stream(spark, cdir)), "append", "q2s")
    got = Counter(r.filename for r in spark.sql("SELECT * FROM q2s").collect())
    want = Counter(r.filename for r in R.question_two(read_commits_json(spark, cdir)).collect())
    assert got == want


def test_q4_stream_final_sums(spark, stream_dirs):
    from flink_assignment_spark.streaming.queries import question_four_stream

    _, _, cdir, _ = stream_dirs
    run_stream(question_four_stream(read_commits_stream(spark, cdir)), "complete", "q4s")
    got = {(r.ext, r.status, r.sum_changes) for r in spark.sql("SELECT * FROM q4s").collect()}
    want = {
        (r.ext, r.status, r.sum_changes)
        for r in R.question_four(read_commits_json(spark, cdir)).collect()
    }
    assert got == want


def test_q6_stream_sliding_windows(spark, stream_dirs):
    from pyspark.sql import functions as F

    from flink_assignment_spark.streaming.queries import question_six_stream

    _, _, cdir, _ = stream_dirs
    stream = read_commits_stream(spark, cdir, max_files=1)
    run_stream(question_six_stream(stream), "append", "q6s")
    got = {
        (r.window_start, r.commit_type, r["count"])
        for r in spark.sql("SELECT * FROM q6s").collect()
    }
    # append mode emits only watermark-closed windows: the sentinel
    # advances the watermark past every REAL window but its own four
    # sliding windows never close — compare against batch minus sentinel
    want = {
        (r.window_start, r.commit_type, r["count"])
        for r in R.question_six(
            read_commits_json(spark, cdir).filter(F.col("sha") != "sentinel")
        ).collect()
    }
    assert got == want and len(got) > 0

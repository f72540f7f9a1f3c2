"""Streaming exact dedup equals batch first-per-key dedup, including
duplicates that arrive in a LATER micro-batch (state-backed dedup,
not per-batch)."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import exact_dedup
from flink_assignment_spark.streaming.dedup_stream import exact_dedup_stream

BASE = datetime(2024, 3, 1, tzinfo=timezone.utc)
SCHEMA = "doc_id long, ts timestamp, text string"


def _rows(specs):
    """specs: (doc_id, minutes_offset, text)"""
    return [(i, BASE + timedelta(minutes=m), t) for i, m, t in specs]


def run_stream(df, name):
    q = df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_dedup_matches_batch_first_per_key(spark, tmp_path):
    """Ascending doc_ids split across two micro-batches: the streaming
    survivor of each text is its min-id doc — exactly the batch
    ``exact_dedup`` keep_id. A duplicate of a batch-1 text arriving in
    batch 2 (doc 7) must also be dropped via persisted state."""
    d = tmp_path / "docs"
    d.mkdir()
    batch1 = _rows(
        [
            (0, 0, "alpha text"),
            (1, 1, "beta text"),
            (2, 2, "alpha text"),  # dup within batch 1
            (3, 3, "gamma text"),
        ]
    )
    batch2 = _rows(
        [
            (4, 10, "delta text"),
            (5, 11, "beta text"),   # dup of batch-1 text
            (6, 12, "delta text"),  # dup within batch 2
            (7, 13, "alpha text"),  # dup of batch-1 text
        ]
    )
    # one part-file per micro-batch so batch order is deterministic
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    out = exact_dedup_stream(stream, ts_col="ts", delay="1 hour")
    run_stream(out, "dedups")
    rows = spark.sql("SELECT text_hash, doc_id FROM dedups").collect()

    batch_docs = spark.createDataFrame(batch1 + batch2, SCHEMA)
    batch_groups = {
        r.text_hash: r.n_dups for r in exact_dedup(batch_docs).collect()
    }
    # exactly one survivor per distinct text (4 texts, 8 docs)
    assert sorted(r.text_hash for r in rows) == sorted(batch_groups)
    # Spark keeps an ARBITRARY row per key within a micro-batch, but
    # across micro-batches state guarantees the first batch wins: a
    # batch-2 duplicate of a batch-1 text (docs 5 and 7) never survives
    survivors = {r.doc_id for r in rows}
    assert not survivors & {5, 7}
    # batch-2-only text (delta) survives via one of its batch-2 docs
    assert survivors & {4, 6}


def test_streaming_dedup_unbounded_variant(spark, tmp_path):
    """Without a ts column the operator falls back to plain
    dropDuplicates — same survivors on a bounded replay."""
    d = tmp_path / "docs2"
    d.mkdir()
    rows = _rows([(0, 0, "x y"), (1, 1, "x y"), (2, 2, "z w")])
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(d / "f1"))
    stream = spark.readStream.schema(SCHEMA).parquet(str(d) + "/*")
    run_stream(exact_dedup_stream(stream), "dedupu")
    got = {r.doc_id for r in spark.sql("SELECT doc_id FROM dedupu").collect()}
    # one survivor per distinct text; WHICH duplicate survives is
    # arbitrary (Spark keeps an arbitrary row per key within a batch)
    assert len(got) == 2 and len(got & {0, 1}) == 1 and 2 in got


def test_streaming_hll_sketch_agg_matches_batch(spark, tmp_path):
    """HLL sketches are mergeable state, so they drop straight into a
    streaming aggregation whose state is merged across micro-batches
    (not recomputed). The incrementally-merged sketch is NOT
    bit-identical to a single-pass sketch (union promotes the sketch
    mode), so assert the estimate stays within the sketch's error
    bound of both the batch estimate and the exact count — for days
    whose rows SPAN the two batches."""
    from pyspark.sql import functions as F

    d = tmp_path / "hll"
    d.mkdir()
    schema = "user_id long, ts timestamp"
    rows1 = [(u, BASE + timedelta(hours=u % 20)) for u in range(300)]
    # batch 2 revisits day 1 with overlapping + new users
    rows2 = [(u, BASE + timedelta(hours=u % 20)) for u in range(150, 450)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    agg = stream.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est")
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName("hlls").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {str(r.day): r.est for r in spark.sql("SELECT * FROM hlls").collect()}

    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        str(r.day): (r.est, r.exact)
        for r in batch.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
            F.count_distinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert len(got) > 0 and set(got) == set(want)
    for day, est in got.items():
        batch_est, exact = want[day]
        assert abs(est - batch_est) <= max(2, 0.02 * exact), (day, est, batch_est)
        assert abs(est - exact) <= max(2, 0.05 * exact), (day, est, exact)


def test_streaming_kll_sketch_agg_matches_batch(spark, tmp_path):
    """KLL quantile sketches are mergeable streaming state exactly
    like HLL: a complete-mode aggregation merges per-micro-batch
    sketches instead of recomputing. Assert the streamed p50/p95
    stay within KLL's 3ε rank-error band of the exact per-day
    quantiles computed over the full replay (k=200 → ε≈1.65%)."""
    from pyspark.sql import functions as F

    d = tmp_path / "kll"
    d.mkdir()
    schema = "value double, ts timestamp"
    rows1 = [(float(i % 997), BASE + timedelta(hours=i % 20)) for i in range(2000)]
    rows2 = [(float((i * 7) % 997), BASE + timedelta(hours=i % 20)) for i in range(2000)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    agg = stream.groupBy(F.to_date("ts").alias("day")).agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value", F.lit(200)), F.lit(0.5)
        ).alias("p50"),
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value", F.lit(200)), F.lit(0.95)
        ).alias("p95"),
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName("klls").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {str(r.day): (r.p50, r.p95) for r in spark.sql("SELECT * FROM klls").collect()}

    eps = 3 * 0.0165
    batch = spark.createDataFrame(rows1 + rows2, schema)
    bands = {
        str(r.day): r
        for r in batch.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.expr(f"percentile(value, {0.5 - eps})").alias("p50_lo"),
            F.expr(f"percentile(value, {0.5 + eps})").alias("p50_hi"),
            F.expr(f"percentile(value, {0.95 - eps})").alias("p95_lo"),
            F.expr(f"percentile(value, {min(0.95 + eps, 1.0)})").alias("p95_hi"),
        )
        .collect()
    }
    assert len(got) > 0 and set(got) == set(bands)
    for day, (p50, p95) in got.items():
        b = bands[day]
        assert b.p50_lo - 1e-9 <= p50 <= b.p50_hi + 1e-9, (day, p50, b)
        assert b.p95_lo - 1e-9 <= p95 <= b.p95_hi + 1e-9, (day, p95, b)


def test_streaming_theta_sketch_agg_exact_small(spark, tmp_path):
    """Theta sketches as streaming state: below the sampling
    threshold (~4096 distinct) the streamed per-day estimate must
    EQUAL the exact distinct count even with users split across
    micro-batches."""
    from pyspark.sql import functions as F

    d = tmp_path / "theta"
    d.mkdir()
    schema = "user_id long, ts timestamp"
    rows1 = [(u, BASE + timedelta(hours=u % 20)) for u in range(400)]
    rows2 = [(u, BASE + timedelta(hours=u % 20)) for u in range(200, 600)]
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(d / "f1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(d / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
    )
    agg = stream.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.theta_sketch_estimate(F.theta_sketch_agg("user_id")))
        .cast("long")
        .alias("est")
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName("thetas").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {str(r.day): r.est for r in spark.sql("SELECT * FROM thetas").collect()}
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        str(r.day): r.exact
        for r in batch.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("exact"))
        .collect()
    }
    assert got == want and len(got) > 0

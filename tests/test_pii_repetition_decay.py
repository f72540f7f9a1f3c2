"""Unit tests for the round-14 additions: PII detection/redaction
(operators/pii.py), word-level repetition stats (q137), and the
exact-dyadic decay score (q139) — invariants independent of the DuckDB
compare in test_synthetic_queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.pii import pii_report, redact_pii


def test_pii_counts_and_redaction_order(spark):
    """Counts come from the raw text; redaction is email → IPv4 →
    phone, each pass blind to the previous pass's placeholders."""
    rows = [
        (1, "mail a.b+c@site.example.org and x@y.io twice"),
        (2, "server at 10.0.255.3 port 80, backup 192.168.1.1"),
        (3, "call 555-0199 or 555-0200"),
        (4, "mixed: bob@ex.com at 10.1.2.3 call 555-1234"),
        (5, "clean text with digits 12345 and dots a.b but no pii"),
    ]
    out = {
        r.doc_id: r
        for r in pii_report(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (2, 0, 0)
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 2, 0)
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 2)
    assert out[4].redacted == "mixed: <EMAIL> at <IP> call <PHONE>"
    assert out[5].redacted == rows[4][1]  # untouched
    # a phone-shaped run inside an IP must NOT be double-redacted:
    # the IP pass wins first and leaves no digits behind
    solo = spark.createDataFrame([(9, "at 555-1234.5.6.7 end")], "doc_id long, text string")
    red = pii_report(solo).collect()[0].redacted
    assert "<" in red and "555-1234.5.6.7" not in red


def test_redact_pii_idempotent(spark):
    """Redacting already-redacted text is a no-op — placeholders never
    re-match any pattern (the property that makes the op safe to run
    at multiple pipeline stages)."""
    df = spark.createDataFrame(
        [(1, "bob@ex.com 10.1.2.3 555-1234")], "doc_id long, text string"
    )
    once = df.select(redact_pii(F.col("text")).alias("t"))
    twice = once.select(redact_pii(F.col("t")).alias("t"))
    assert once.collect() == twice.collect()


def test_repetition_stats_known_values(spark):
    from flink_assignment_spark.queries.synthetic import q137_repetition_stats

    # build a miniature documents table through the same query fn by
    # monkey-free means: call the kernel expressions directly instead
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # 6 tokens, 2 distinct, top bigram "a b" x3
            (2, "w x y z"),          # all distinct, every bigram count 1
            (3, "solo"),             # 1 token: no bigram
        ],
        "doc_id long, text string",
    )
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in q137_repetition_stats(spark, d).collect()}
    assert out[1].n_tokens == 6 and out[1].top_bigram == "a b"
    assert abs(out[1].dup_token_frac - (1 - 2 / 6)) < 1e-6  # rounded to 6dp
    assert abs(out[1].top_bigram_frac - 1.0) < 1e-6  # 2*3/6
    assert out[2].top_bigram == "w x" and abs(out[2].top_bigram_frac - 0.5) < 1e-6
    assert out[2].dup_token_frac == 0.0
    assert out[3].top_bigram is None and out[3].top_bigram_frac == 0.0


def test_decay_score_partitioning_invariant(spark):
    """The dyadic construction makes the double sum independent of
    fold order: the score is bit-identical under any repartitioning
    (the property pow()-based decay cannot give)."""
    import tempfile, os

    from flink_assignment_spark.queries.synthetic import q139_decay_activity
    from flink_assignment_spark.sources.loaders import load_table

    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    d = tempfile.mkdtemp()
    ev.repartition(37).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    a = {r.user_id: (r.decay_score, r.n_events)
         for r in q139_decay_activity(spark, SF_DIR).collect()}
    b = {r.user_id: (r.decay_score, r.n_events)
         for r in q139_decay_activity(spark, d).collect()}
    assert a == b  # bit-identical doubles, not approximately equal


def test_pii_report_runs_verbatim_on_a_stream(spark, tmp_path):
    """pii_report is a stateless narrow map — the SAME call compiles
    on a streaming frame and each micro-batch equals the batch op."""
    rows = [(1, "bob@ex.com at 10.1.2.3"), (2, "call 555-1234 now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    in_dir = tmp_path / "in"
    df.coalesce(1).write.parquet(str(in_dir / "f0"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(str(in_dir) + "/*")
    )
    got = []
    q = (
        pii_report(stream)
        .writeStream.outputMode("append")
        .foreachBatch(lambda b, _: got.extend(tuple(r) for r in b.collect()))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    want = {tuple(r) for r in pii_report(df).collect()}
    assert set(got) == want


def test_pipeline_scrub_pii_extended(spark):
    """CorpusPipeline.scrub_pii(extended=True) layers the q138
    categories on top of the default email/URL scrub; the default
    path stays byte-stable (q83's oracle depends on it)."""
    from flink_assignment_spark.pipeline import CorpusPipeline

    docs = spark.createDataFrame(
        [(1, "see https://site.example/x mail a@b.io ip 10.1.2.3 call 555-1234")],
        "doc_id long, text string",
    )
    base = CorpusPipeline(docs).scrub_pii().df.collect()[0].text
    assert base == "see <URL> mail <EMAIL> ip 10.1.2.3 call 555-1234"
    ext = CorpusPipeline(docs).scrub_pii(extended=True).df.collect()[0].text
    assert ext == "see <URL> mail <EMAIL> ip <IP> call <PHONE>"


def test_decay_age_clamps_future_events(spark):
    """An event dated AFTER asof (or a read with an earlier asof) must
    score at age 0 — a negative shift count would wrap mod 64 in
    Spark/Java while DuckDB's << does not, silently breaking the exact
    cross-engine dyadic contract (r14 ADVICE)."""
    from pyspark.sql import functions as F

    from flink_assignment_spark.operators.decay_score import decay_age

    df = spark.createDataFrame(
        [("2024-02-05",), ("2024-02-01",), ("2024-01-31",), (None,)],
        "day string",
    ).select(decay_age(F.col("day").cast("date"), "2024-02-01").alias("k"))
    ks = [r.k for r in df.collect()]
    assert ks == [0, 0, 1, 30]
    # the full term stays a positive dyadic rational for a future day
    term = df.select(
        F.expr(
            "cast(1 as double) / cast(shiftleft(cast(1 as bigint), k) as double)"
        ).alias("t")
    )
    assert all(0 < r.t <= 1.0 for r in term.collect())

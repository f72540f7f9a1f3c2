#!/usr/bin/env python
"""Scaling experiment: run representative event queries at 1×, 10×,
and 100× the sf0.1 event volume and report rows/sec per scale.

The claim under test is the 100 TB design contract: window
aggregation, two-level aggregation, the bucketed interval join, and
sessionization should scale ~linearly in input rows when data density
per key is held constant (users grow with the data, as in reality).

Data is generated IN SPARK (deterministic id-derived columns, no
driver-side loop) and written as parquet under /tmp — the same shape
as the driver's events table.

Usage: python bench_scaling.py [--scales 100000 1000000 10000000]
"""

from __future__ import annotations

import argparse
import json
import os
import time

EPOCH_2024_US = 1704067200 * 1_000_000
MONTH_US = 30 * 86400 * 1_000_000


def ensure_events(spark, n_rows: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    n_users = max(n_rows // 666, 1)  # constant per-user density
    df = spark.range(n_rows).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(EPOCH_2024_US) + (F.col("id") * 2654435761) % MONTH_US
        ).alias("ts"),
        ((F.col("id") * 40503) % n_users).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in ["click", "view", "purchase", "signup", "error"]]),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("event_type"),
        (((F.col("id") * 7919) % 49001) / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), (F.col("id") % 100).cast("string"), F.lit("}")).alias(
            "props"
        ),
    )
    df.write.mode("overwrite").parquet(path)


def ensure_documents(spark, n_docs: int, path: str) -> None:
    """Documents with CONSTANT near-dup density: groups of 3 docs, 60
    tokens each, variants perturb the first 2 tokens — so every group
    contributes ~3 high-Jaccard pairs and the true-pair volume is O(n)
    at every scale (the property real corpora have; naive replication
    would instead grow clusters quadratically and measure the data,
    not the algorithm). All columns derive from ``id`` JVM-side."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    from pyspark.sql import functions as F

    group = (F.col("id") / 3).cast("long")
    variant = F.col("id") % 3
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(59)),
        lambda i: F.concat(
            F.lit("w"),
            ((group * 6151 + i * 769) % 9999991).cast("string"),
            F.when((i < 2) & (variant != 0), variant.cast("string")).otherwise(F.lit("")),
        ),
    )
    df = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", toks).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("scalegen").alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    df.write.mode("overwrite").parquet(path)


def _timed_reps(spark, qn: str, base: str, n_rows: int, reps: int) -> dict:
    """Run one registry query ``reps`` times; report the median (all
    reps recorded — rep 1 typically carries JIT/worker warmup)."""
    import statistics
    import time

    from flink_assignment_spark.queries.synthetic import REGISTRY

    secs = []
    for _ in range(reps):
        t0 = time.monotonic()
        REGISTRY[qn].spark(spark, base).write.format("noop").mode("overwrite").save()
        secs.append(time.monotonic() - t0)
    # statistics.median averages the middle pair for even rep counts —
    # the upper-middle element would report the SLOWER (often warmup) run
    med = statistics.median(secs)
    return {
        "sec": round(med, 2),
        "rows_per_sec": int(n_rows / med),
        "reps": [round(s, 2) for s in secs],
    }


def stream_lsh_sweep(
    spark,
    scales: list[int],
    n_batches: int = 10,
    max_state_bucket: int = 50,
    backend_name: str = "parquet",
    compact_every: int = 0,
) -> dict:
    """Per-batch latency of the incremental MinHash-LSH detector as
    the corpus state grows. The claim under test: each micro-batch's
    cost is bounded by ITS OWN volume plus the (cap-bounded) buckets
    it collides with — not by total accumulated state — because only
    touched pt partitions are read/rewritten and the saturation valve
    tombstones degenerate buckets. Evidence shape: per-batch seconds
    across a 10-batch id-ordered replay at each corpus scale, plus
    final state/pair volumes."""
    import shutil

    from pyspark.sql import functions as F

    from flink_assignment_spark.streaming.lsh_stream import merge_lsh_batch

    backend = None
    if backend_name == "manifest":
        from flink_assignment_spark.streaming._state import ManifestStateBackend

        backend = ManifestStateBackend()
    out = {}
    for n in scales:
        base = f"/tmp/fas_docscale_{n}"
        ensure_documents(spark, n, os.path.join(base, "documents.parquet"))
        docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
        state_dir = f"/tmp/fas_lsh_stream_{n}"
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.makedirs(state_dir)
        bsz = n // n_batches
        per_batch = []
        # compaction timings live under their OWN key (batch idx →
        # seconds): per_batch_sec stays homogeneous floats so stat
        # consumers (mean/trend over the flat-curve analysis) never
        # aggregate a string (r7 ADVICE)
        compact_sec = {}
        for b in range(n_batches):
            batch = docs.filter(
                (F.col("doc_id") >= b * bsz) & (F.col("doc_id") < (b + 1) * bsz)
            )
            t0 = time.monotonic()
            merge_lsh_batch(
                batch, b, state_dir,
                max_state_bucket=max_state_bucket, backend=backend,
            )
            per_batch.append(round(time.monotonic() - t0, 2))
            if compact_every and (b + 1) % compact_every == 0:
                from flink_assignment_spark.streaming._detector import (
                    compact_state,
                )

                t0 = time.monotonic()
                compact_state(
                    spark, state_dir, ["band", "key"], "sig", backend
                )
                compact_sec[b] = round(time.monotonic() - t0, 2)
        from flink_assignment_spark.streaming._detector import read_pairs
        from flink_assignment_spark.streaming._state import DEFAULT_BACKEND

        be = backend or DEFAULT_BACKEND
        st = be.read(spark, os.path.join(state_dir, "buckets"), "pt")
        state_rows = st.count() if st is not None else 0
        n_pairs = read_pairs(
            spark, state_dir, "doc_a long, doc_b long, est_jaccard double", backend
        ).count()
        out[str(n)] = {
            "per_batch_sec": per_batch,
            "compact_sec": compact_sec,
            "batch_rows": bsz,
            "state_rows_final": state_rows,
            "distinct_pairs": n_pairs,
        }
        shutil.rmtree(state_dir)
    return out


def stream_simhash_sweep(
    spark, scales: list[int], n_batches: int = 10, max_state_bucket: int = 50
) -> dict:
    """Per-batch latency of the incremental SimHash detector (same
    protocol as the LSH sweep — the two share the bucketed-detector
    engine, so this isolates the cost of the cheaper signature)."""
    import shutil

    from pyspark.sql import functions as F

    from flink_assignment_spark.streaming.simhash_stream import merge_simhash_batch

    out = {}
    for n in scales:
        base = f"/tmp/fas_docscale_{n}"
        ensure_documents(spark, n, os.path.join(base, "documents.parquet"))
        docs = spark.read.parquet(os.path.join(base, "documents.parquet"))
        state_dir = f"/tmp/fas_simhash_stream_{n}"
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        os.makedirs(state_dir)
        bsz = n // n_batches
        per_batch = []
        for b in range(n_batches):
            batch = docs.filter(
                (F.col("doc_id") >= b * bsz) & (F.col("doc_id") < (b + 1) * bsz)
            )
            t0 = time.monotonic()
            merge_simhash_batch(batch, b, state_dir, max_state_bucket=max_state_bucket)
            per_batch.append(round(time.monotonic() - t0, 2))
        from flink_assignment_spark.streaming.simhash_stream import read_verified_pairs

        out[str(n)] = {
            "per_batch_sec": per_batch,
            "batch_rows": bsz,
            "verified_pairs": read_verified_pairs(spark, state_dir).count(),
        }
        shutil.rmtree(state_dir)
    return out


def stream_cc_sweep(spark, scales: list[int], n_batches: int = 10) -> dict:
    """Per-batch latency of incremental connected components as the
    mapping state grows. Pairs come straight from the doc generator's
    known group structure (groups of 3 near-dups → 3 pairs per group,
    O(n) true pairs), id-ordered — so per-batch affected-component
    volume stays constant while total state grows 10×; flat per-batch
    cost is the claim under test."""
    import shutil

    from pyspark.sql import functions as F

    from flink_assignment_spark.streaming.components_stream import (
        merge_components_batch,
        read_components,
    )

    out = {}
    for n in scales:
        g = (F.col("id") / 3).cast("long") * 3
        pairs = (
            spark.range(n)
            .select(
                F.when(F.col("id") % 3 == 0, g)
                .when(F.col("id") % 3 == 1, g)
                .otherwise(g + 1)
                .alias("doc_a"),
                F.when(F.col("id") % 3 == 0, g + 1)
                .when(F.col("id") % 3 == 1, g + 2)
                .otherwise(g + 2)
                .alias("doc_b"),
            )
        )
        state_dir = f"/tmp/fas_cc_stream_{n}"
        if os.path.exists(state_dir):
            shutil.rmtree(state_dir)
        bsz = n // n_batches
        per_batch = []
        for b in range(n_batches):
            batch = pairs.filter(
                (F.col("doc_a") >= b * bsz) & (F.col("doc_a") < (b + 1) * bsz)
            )
            t0 = time.monotonic()
            merge_components_batch(batch, b, state_dir)
            per_batch.append(round(time.monotonic() - t0, 2))
        out[str(n)] = {
            "per_batch_sec": per_batch,
            "batch_pairs": bsz,
            "mapping_rows": read_components(spark, state_dir).count(),
        }
        shutil.rmtree(state_dir)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--scales", type=int, nargs="+", default=[100_000, 1_000_000, 10_000_000]
    )
    ap.add_argument(
        "--doc-scales", type=int, nargs="+", default=[5_000, 50_000, 500_000]
    )
    ap.add_argument(
        "--doc-queries",
        nargs="+",
        default=[
            "q16_dedup_minhash_lsh",
            "q29_dedup_clusters",
            "q66_sequence_packing",
            "q68_chunk_dedup",
            "q73_lm_score",
            "q78_shingle_novelty",
            "q83_pipeline_e2e",
        ],
    )
    ap.add_argument(
        "--reps",
        type=int,
        default=3,
        help="repetitions per (query, scale); median reported (single-run "
        "noise on this harness is up to ±2x)",
    )
    ap.add_argument(
        "--n-batches", type=int, default=10,
        help="micro-batches per scale in the stream sweeps",
    )
    ap.add_argument(
        "--compact-every", type=int, default=0,
        help="run detector compact_state every N batches in the "
        "stream-lsh sweep (0 = never)",
    )
    ap.add_argument(
        "--state-backend",
        choices=["parquet", "manifest"],
        default="parquet",
        help="state backend for the stream-lsh sweep (seam comparison)",
    )
    ap.add_argument(
        "--stream-lsh",
        action="store_true",
        help="run ONLY the streaming-LSH per-batch latency sweep "
        "(10 micro-batches per scale, scales from --doc-scales)",
    )
    ap.add_argument(
        "--stream-simhash",
        action="store_true",
        help="run ONLY the streaming-SimHash per-batch latency sweep",
    )
    ap.add_argument(
        "--stream-cc",
        action="store_true",
        help="run ONLY the incremental connected-components sweep "
        "(pair counts from --doc-scales)",
    )
    args = ap.parse_args()

    from flink_assignment_spark.queries.synthetic import REGISTRY  # noqa: F401
    from flink_assignment_spark.session import get_spark

    spark = get_spark("fas-bench-scaling")

    if args.stream_lsh:
        print(
            json.dumps(
                {
                    "metric": "streaming-LSH per-batch latency vs corpus state",
                    "backend": args.state_backend,
                    "stream_lsh": stream_lsh_sweep(
                        spark,
                        args.doc_scales,
                        n_batches=args.n_batches,
                        backend_name=args.state_backend,
                        compact_every=args.compact_every,
                    ),
                }
            )
        )
        return
    if args.stream_simhash:
        print(
            json.dumps(
                {
                    "metric": "streaming-SimHash per-batch latency vs corpus state",
                    "stream_simhash": stream_simhash_sweep(spark, args.doc_scales),
                }
            )
        )
        return
    if args.stream_cc:
        print(
            json.dumps(
                {
                    "metric": "incremental-CC per-batch latency vs mapping state",
                    "stream_cc": stream_cc_sweep(spark, args.doc_scales),
                }
            )
        )
        return
    qnames = [
        "q05_tumbling_daily",
        "q07_daily_summary_having",
        "q08_interval_join_weekly",
        "q10_sessionize",
    ]
    results = {}
    for n in args.scales:
        base = f"/tmp/fas_scale_{n}"
        ensure_events(spark, n, os.path.join(base, "events.parquet"))
        results[str(n)] = {qn: _timed_reps(spark, qn, base, n, args.reps) for qn in qnames}

    doc_qnames = args.doc_queries
    doc_results = {}
    for n in args.doc_scales:
        base = f"/tmp/fas_docscale_{n}"
        ensure_documents(spark, n, os.path.join(base, "documents.parquet"))
        doc_results[str(n)] = {
            qn: _timed_reps(spark, qn, base, n, args.reps) for qn in doc_qnames
        }
    print(
        json.dumps(
            {
                "metric": "event-query scaling 1x/10x/100x",
                "results": results,
                "dedup_results": doc_results,
            }
        )
    )


if __name__ == "__main__":
    main()

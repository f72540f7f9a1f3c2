"""Streaming MinHash-LSH near-duplicate detection.

The incremental form of the batch q16 pipeline: each arriving micro-
batch is shingled, MinHash-signed (the SAME 16 permutations /
md5-derived hashes as ``operators.dedup``), LSH-banded (the SAME
``band_keys`` helper, so keys are byte-identical by construction),
and joined against the corpus-so-far's bucket state — a crawl batch
learns which of its documents near-duplicate ANY earlier document
without re-scanning the corpus.

State layout under ``state_dir`` (bucket-partitioned parquet via
``streaming._state.swap_partitions``; production = the identical
MERGE INTO through Delta/Iceberg):

- ``buckets/pt=K/`` — one row per (band, key, doc_id, sig): an LSH
  bucket membership carrying the member's full 16-slot signature.
  ``pt = band_key_hash % N_PT`` bounds each micro-batch's rewrite to
  the partitions it actually touches.
- ``pairs/`` — appended candidate pairs ``(doc_a, doc_b, est_jaccard)``
  with ``est_jaccard`` = fraction of agreeing signature slots (the
  standard MinHash estimator). :func:`verify_candidates` (or a
  threshold filter) consumes this table.

Candidate-set completeness is ORDER-INDEPENDENT: for any pair, the
later-arriving doc meets the earlier one in bucket state (new×old),
or both share a micro-batch (new×new) — each colliding pair is found
exactly once either way. tests/test_streaming_lsh.py pins the
accumulated candidate set equal to the batch banding's bucket pairs,
the estimator equal to its batch value, and recall of every q16
verified pair. Contract scope: the equality holds for the UNCAPPED
configuration; batch q16 additionally applies MAX_SHINGLE_DF /
MAX_LSH_BUCKET caps, which are corpus-global knowledge a stream
cannot reproduce incrementally — on corpora where those caps actually
fire, the uncapped stream yields a SUPERSET of the capped batch
candidates (never a miss), at a skew cost the ``max_state_bucket``
valve below bounds.

``max_state_bucket`` is the streaming skew valve (the incremental
analogue of batch ``max_bucket``): once a (band, key) bucket's state
exceeds the cap it is SATURATED — its members are replaced by a
single tombstone row, it stops emitting pairs, and it stops growing.
Exactly like the batch cap, this sacrifices recall only on degenerate
buckets (near-constant corpora that exact-dedup should have removed),
and it bounds both state size and the new×old fan-out per key for the
stream's whole lifetime.

Replay: the ``_applied_batch`` marker (``streaming._state``) is
committed after the state merge; a redelivered batch is recomputed
idempotently — the bucket upsert is a set union; pairs may duplicate
and are distinct'd at read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import MINHASH_PERMS
from ..operators.dedup import band_keys, doc_shingles, minhash_signatures
from ._state import applied_batch, commit_marker, swap_partitions

N_PT = 64
N_PERMS = len(MINHASH_PERMS)


def _buckets_path(state_dir: str) -> str:
    return os.path.join(state_dir, "buckets")


def _pairs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "pairs")


def _banded_sigs(batch_df: DataFrame, text_col: str, id_col: str, rows_per_band: int):
    """(doc_id, sig, band, key, pt) — one row per band per doc."""
    sh = doc_shingles(batch_df, text_col, id_col)
    sigs = minhash_signatures(batch_df, text_col, id_col, shingles=sh)
    sig = F.array(*[F.col(f"mh{i}") for i in range(N_PERMS)])
    return band_keys(sigs.withColumn("sig", sig), rows_per_band).withColumn(
        "pt", F.pmod(F.crc32(F.concat_ws("|", "band", "key")), F.lit(N_PT)).cast("int")
    )


def _est_jaccard(sig_a, sig_b):
    agree = F.aggregate(
        F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return F.round(agree / F.lit(N_PERMS), 6)


def merge_lsh_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_band: int = 2,
    max_state_bucket: int | None = None,
) -> None:
    """Detect the batch's candidate near-dup pairs against state +
    within the batch, append them, and fold the batch into state."""
    if batch_id <= applied_batch(state_dir):
        return
    spark = batch_df.sparkSession
    bpath = _buckets_path(state_dir)
    banded = _banded_sigs(batch_df, text_col, id_col, rows_per_band).cache()
    touched = [int(r.pt) for r in banded.select("pt").distinct().collect()]
    if not touched:  # empty batch / no shingle-bearing docs: no-op
        banded.unpersist()
        commit_marker(state_dir, batch_id)
        return

    have_state = os.path.exists(os.path.join(bpath, "_SUCCESS"))
    if have_state:
        # one cached read of the touched partitions feeds BOTH the
        # candidate join and the state fold
        state = (
            spark.read.option("basePath", bpath)
            .parquet(bpath)
            .filter(F.col("pt").isin(touched))
            .cache()
        )
        live = state.filter(F.col("doc_id").isNotNull())  # skip tombstones
        new_old = (
            banded.alias("n")
            .join(
                live.alias("o"),
                (F.col("n.band") == F.col("o.band"))
                & (F.col("n.key") == F.col("o.key"))
                & (F.col("n.doc_id") != F.col("o.doc_id")),
            )
            .select(
                F.least("n.doc_id", "o.doc_id").alias("doc_a"),
                F.greatest("n.doc_id", "o.doc_id").alias("doc_b"),
                _est_jaccard(F.col("n.sig"), F.col("o.sig")).alias("est_jaccard"),
            )
        )
        # members landing in an already-saturated bucket emit nothing
        tombstoned = state.filter(F.col("doc_id").isNull()).select("band", "key")
        new_new_src = banded.join(
            F.broadcast(tombstoned), ["band", "key"], "left_anti"
        )
    else:
        state = None
        new_old = None
        new_new_src = banded
    new_new = (
        new_new_src.alias("a")
        .join(
            new_new_src.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            _est_jaccard(F.col("a.sig"), F.col("b.sig")).alias("est_jaccard"),
        )
    )
    pairs = (new_new if new_old is None else new_new.unionByName(new_old)).distinct().cache()
    if pairs.count():
        pairs.write.mode("append").parquet(_pairs_path(state_dir))
    pairs.unpersist()

    # fold the batch's bucket rows into the touched pt partitions;
    # buckets crossing max_state_bucket collapse to a tombstone row
    out = banded.select("pt", "band", "key", "doc_id", "sig")
    if state is not None:
        out = state.select("pt", "band", "key", "doc_id", "sig").unionByName(out)
    out = out.distinct()
    if max_state_bucket is not None:
        # saturation is STICKY: a bucket already tombstoned keeps only
        # its tombstone (new arrivals are dropped), and a live bucket
        # crossing the cap this batch collapses to a fresh tombstone
        keys = ["pt", "band", "key"]
        as_tomb = lambda df: df.select(  # noqa: E731
            *keys,
            F.lit(None).cast("long").alias("doc_id"),
            F.lit(None).cast("array<long>").alias("sig"),
        )
        old_tombs = out.filter(F.col("doc_id").isNull()).select(*keys).distinct()
        live = out.filter(F.col("doc_id").isNotNull()).join(
            F.broadcast(old_tombs), keys, "left_anti"
        )
        hot = (
            live.groupBy(*keys)
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_state_bucket)
            .select(*keys)
        )
        out = (
            live.join(F.broadcast(hot), keys, "left_anti")
            .unionByName(as_tomb(old_tombs))
            .unionByName(as_tomb(hot))
        )
    swap_partitions(
        out.select("band", "key", "doc_id", "sig", "pt"), bpath, "pt", touched
    )
    if state is not None:
        state.unpersist()
    banded.unpersist()
    commit_marker(state_dir, batch_id)


def incremental_lsh_neardup(
    docs: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_band: int = 2,
    max_state_bucket: int | None = None,
):
    """Start the streaming near-dup query; returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_lsh_batch(
            batch_df,
            batch_id,
            state_dir,
            text_col,
            id_col,
            rows_per_band,
            max_state_bucket,
        )

    return docs.writeStream.outputMode("append").foreachBatch(_sink).start()


def read_candidate_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated distinct candidate pairs with their signature-
    estimated Jaccard (replays may append duplicates — distinct'd
    here). A stream that has processed batches but never collided
    creates no ``pairs/`` directory — that is a legitimate empty
    result, not an error."""
    path = _pairs_path(state_dir)
    if not os.path.exists(path):
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, est_jaccard double"
        )
    return spark.read.parquet(path).distinct()


def verify_candidates(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-Jaccard verification of accumulated streamed candidates —
    the batch half of the incremental detect→verify loop. Restricts
    the inverted index to candidate docs (the q16 trick: the verify
    join is bounded by candidate volume, not corpus size) and returns
    ``(doc_a, doc_b, est_jaccard, jaccard)`` for pairs at or above
    ``threshold``. ``pairs`` feeds three plan branches and the shingle
    index feeds a self-join, so both are cached here (the q16 caching
    rationale: Spark performs no cross-branch common-subexpression
    elimination). Run per day/week over the pairs table; the streaming
    side keeps only estimates, so the expensive exact join never
    blocks ingest."""
    from ..operators.dedup import ngram_jaccard_pairs

    pairs = pairs.cache()
    pairs.count()
    cand_docs = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh_cand = (
        doc_shingles(docs, text_col, id_col).join(cand_docs, id_col, "left_semi").cache()
    )
    exact = ngram_jaccard_pairs(docs, threshold, text_col, id_col, shingles=sh_cand)
    return pairs.join(exact, ["doc_a", "doc_b"])

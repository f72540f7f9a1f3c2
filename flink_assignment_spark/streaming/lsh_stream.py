"""Streaming MinHash-LSH near-duplicate detection.

The incremental form of the batch q16 pipeline: each arriving micro-
batch is shingled, MinHash-signed (the SAME 16 permutations /
md5-derived hashes as ``operators.dedup``), LSH-banded, and joined
against the corpus-so-far's bucket state — a crawl batch learns which
of its documents near-duplicate ANY earlier document without ever
re-scanning the corpus.

State layout under ``state_dir`` (same bucket-partitioned parquet
pattern as ``novelty_stream``; production = the identical MERGE INTO
through Delta/Iceberg):

- ``buckets/pt=K/`` — one row per (band, key, doc_id, sig): an LSH
  bucket membership carrying the member's full 16-slot signature.
  ``pt = band_key_hash % N_PT`` bounds each micro-batch's rewrite to
  the partitions it actually touches.
- ``pairs/`` — appended candidate pairs ``(doc_a, doc_b, est_jaccard)``
  with ``est_jaccard`` = fraction of agreeing signature slots (the
  standard MinHash estimator). A downstream exact-verify (q15's
  capped-index join over just these pairs) or a threshold filter
  consumes this table.

Candidate-set completeness is ORDER-INDEPENDENT: for any pair, the
later-arriving doc meets the earlier one in bucket state (new×old),
or both share a micro-batch (new×new) — each colliding pair is found
exactly once either way. tests/test_streaming_lsh.py pins the
accumulated candidate set equal to the batch banding's bucket pairs,
the estimator equal to its batch value, and recall of every q16
verified pair.

Replay: the ``_applied_batch`` marker (committed after the state
merge, before which a redelivered batch is recomputed idempotently —
bucket upsert is a set union; pairs may duplicate and are distinct'd
at read) mirrors ``novelty_stream``'s contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import MINHASH_PERMS
from ..operators.dedup import doc_shingles, minhash_signatures

N_PT = 64
N_PERMS = len(MINHASH_PERMS)


def _buckets_path(state_dir: str) -> str:
    return os.path.join(state_dir, "buckets")


def _pairs_path(state_dir: str) -> str:
    return os.path.join(state_dir, "pairs")


def _applied_batch(state_dir: str) -> int:
    marker = os.path.join(state_dir, "_applied_batch")
    if os.path.exists(marker):
        with open(marker) as f:
            return int(f.read().strip() or -1)
    return -1


def _commit_marker(state_dir: str, batch_id: int) -> None:
    tmp = os.path.join(state_dir, "_applied_batch.tmp")
    with open(tmp, "w") as f:
        f.write(str(int(batch_id)))
    os.replace(tmp, os.path.join(state_dir, "_applied_batch"))


def _banded_sigs(batch_df: DataFrame, text_col: str, id_col: str, rows_per_band: int):
    """(doc_id, sig, band, key, pt) — one row per band per doc."""
    sh = doc_shingles(batch_df, text_col, id_col)
    sigs = minhash_signatures(batch_df, text_col, id_col, shingles=sh)
    sig = F.array(*[F.col(f"mh{i}") for i in range(N_PERMS)])
    bands = []
    for band_idx in range(N_PERMS // rows_per_band):
        cols = [
            F.col(f"mh{band_idx * rows_per_band + r}") for r in range(rows_per_band)
        ]
        bands.append(
            F.struct(
                F.lit(band_idx).alias("band"), F.concat_ws(",", *cols).alias("key")
            )
        )
    return (
        sigs.select("doc_id", sig.alias("sig"), F.explode(F.array(*bands)).alias("bk"))
        .select("doc_id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
        .withColumn("pt", F.pmod(F.crc32(F.concat_ws("|", "band", "key")), F.lit(N_PT)).cast("int"))
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
) -> None:
    """Detect the batch's candidate near-dup pairs against state +
    within the batch, append them, and fold the batch into state."""
    if batch_id <= _applied_batch(state_dir):
        return
    spark = batch_df.sparkSession
    bpath = _buckets_path(state_dir)
    banded = _banded_sigs(batch_df, text_col, id_col, rows_per_band).cache()

    have_state = os.path.exists(os.path.join(bpath, "_SUCCESS"))
    touched = [int(r.pt) for r in banded.select("pt").distinct().collect()]
    if have_state:
        state = (
            spark.read.option("basePath", bpath)
            .parquet(bpath)
            .filter(F.col("pt").isin(touched))
        )
        new_old = (
            banded.alias("n")
            .join(
                state.alias("o"),
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
    else:
        new_old = None
    new_new = (
        banded.alias("a")
        .join(
            banded.alias("b"),
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
    pairs = new_new if new_old is None else new_new.unionByName(new_old)
    pairs.distinct().write.mode("append").parquet(_pairs_path(state_dir))

    # fold the batch's bucket rows into the touched pt partitions
    # (staging + per-partition swap — same crash contract as
    # novelty_stream; the upsert is a set union, so replay converges)
    out = banded.select("pt", "band", "key", "doc_id", "sig")
    if have_state:
        existing = (
            spark.read.option("basePath", bpath)
            .parquet(bpath)
            .filter(F.col("pt").isin(touched))
            .select("pt", "band", "key", "doc_id", "sig")
        )
        out = existing.unionByName(out).distinct()
    staging = bpath + ".staging"
    if os.path.exists(staging):
        shutil.rmtree(staging)
    out.select("band", "key", "doc_id", "sig", "pt").write.partitionBy("pt").parquet(
        staging
    )
    os.makedirs(bpath, exist_ok=True)
    for pt in touched:
        src = os.path.join(staging, f"pt={pt}")
        dst = os.path.join(bpath, f"pt={pt}")
        if os.path.exists(src):
            if os.path.exists(dst):
                shutil.rmtree(dst)
            os.rename(src, dst)
    shutil.rmtree(staging)
    open(os.path.join(bpath, "_SUCCESS"), "a").close()
    banded.unpersist()
    _commit_marker(state_dir, batch_id)


def incremental_lsh_neardup(
    docs: DataFrame,
    state_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_band: int = 2,
):
    """Start the streaming near-dup query; returns the StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_lsh_batch(batch_df, batch_id, state_dir, text_col, id_col, rows_per_band)

    return docs.writeStream.outputMode("append").foreachBatch(_sink).start()


def read_candidate_pairs(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated distinct candidate pairs with their signature-
    estimated Jaccard (replays may append duplicates — distinct'd
    here)."""
    return spark.read.parquet(_pairs_path(state_dir)).distinct()


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
    ``threshold``. Run per day/week over the pairs table; the
    streaming side keeps only estimates, so the expensive exact join
    never blocks ingest."""
    from ..operators.dedup import ngram_jaccard_pairs

    cand_docs = (
        pairs.select(F.col("doc_a").alias(id_col))
        .union(pairs.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh_cand = doc_shingles(docs, text_col, id_col).join(
        cand_docs, id_col, "left_semi"
    )
    exact = ngram_jaccard_pairs(docs, threshold, text_col, id_col, shingles=sh_cand)
    return pairs.join(exact, ["doc_a", "doc_b"])

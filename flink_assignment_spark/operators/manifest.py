"""Corpus manifest — content-addressed integrity audit.

A curation pipeline that erases subjects (operators/erasure.py,
streaming/erasure_stream.py), rewrites buckets, and compacts state
needs a cheap way to PROVE two copies of a table hold the same rows —
across engines, partitionings, and file layouts. The manifest is the
lakehouse answer: per hash-bucket, the row count and an
order-independent digest (the SUM of per-row md5-derived hashes,
wrapped into 63 bits so the engines' bigint overflow semantics never
fire). Equal manifests ⇔ equal row multisets per bucket (up to hash
collision, ~2^-60 per row pair); a single changed, dropped, or
duplicated row flips exactly its bucket's row — so a diff localizes
WHERE two copies diverge, the point of bucketing the digest.

Design notes:

- SUM, not an ordered fold: addition is commutative/associative, so
  the digest is partition- and order-independent by construction — no
  sort, one aggregate pass, map-side partials (same reason the
  mixture/decay folds use order-free forms).
- md5-derived ``hash60``, not the engines' native ``hash``: the
  DuckDB oracle computes the identical value, so the manifest itself
  is oracle-checkable (the hash-dependent-operator rule every MinHash/
  SimHash query here follows).
- the sum runs in DECIMAL(38,0) on the Spark side (exact to 10^38 —
  ~10^20 rows per bucket before it could saturate) because a bigint
  sum of 60-bit values overflows after only EIGHT rows, and Spark's
  silent two's-complement wrap disagrees with DuckDB's int128
  accumulation; the final ``% 2^63`` renormalizes both engines to the
  same non-negative bigint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

N_BUCKETS = 64
_WRAP = 2**63


def row_digest(cols: list[Column]) -> Column:
    """60-bit content hash of one row: md5 over the '\\x1f'-joined
    per-column encodings. Each column is encoded NULL-bijectively —
    NULL → '\\x00', value v → '\\x01' + str(v) — because Spark's
    concat_ws SKIPS null arguments (no empty slot), so without the
    explicit encoding ('a', NULL, 'b') and ('a', 'b', NULL) would
    collide to one digest (r15 ADVICE). The one-byte prefixes keep
    NULL distinct from every real string including '' and '\\x00'.
    The DuckDB oracle mirrors it as
    ``coalesce(chr(1) || CAST(c AS VARCHAR), chr(0))``."""
    enc = [
        F.coalesce(
            F.concat(F.lit("\x01"), c.cast("string")), F.lit("\x00")
        )
        for c in cols
    ]
    return hash60(F.concat_ws("\x1f", *enc))


def _key_bucket(key_col: str, n_buckets: int):
    """Hash bucket of a row key, NULL-SAFE: a NULL key encodes to the
    '\\x00' sentinel instead of NULL-propagating through the concat —
    otherwise NULL-keyed rows land in a NULL bucket that every
    null-unsafe bucket join/filter silently drops (r16 review: the
    repair scan excluded them from BOTH sides and reported corrupted
    NULL-key rows as equal). Mirrored in the oracles as
    ``md5('manifest:' || coalesce(chr(1) || CAST(k AS VARCHAR),
    chr(0)))``."""
    enc = F.coalesce(
        F.concat(F.lit("\x01"), F.col(key_col).cast("string")), F.lit("\x00")
    )
    return F.pmod(
        hash60(F.concat(F.lit("manifest:"), enc)), F.lit(n_buckets)
    ).cast("int")


def corpus_manifest(
    df: DataFrame,
    key_col: str,
    content_cols: list[str],
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """``(bucket, n_rows, digest)`` per hash-bucket of ``key_col`` —
    one aggregate pass, fully order/partitioning-independent."""
    h = row_digest([F.col(c) for c in content_cols])
    bucket = _key_bucket(key_col, n_buckets)
    return (
        df.select(bucket.alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            # 2^63 exceeds a JVM long literal — ship it as a decimal
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.expr(f"CAST('{_WRAP}' AS DECIMAL(38,0))")
            )
            .cast("long")
            .alias("digest"),
        )
    )


def manifest_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Buckets where two manifests disagree (full outer join on
    bucket; a bucket present on one side only also surfaces) — the
    localization step an integrity check runs before any row-level
    repair scan."""
    aa = a.select(
        "bucket",
        F.col("n_rows").alias("n_rows_a"),
        F.col("digest").alias("digest_a"),
    )
    bb = b.select(
        "bucket",
        F.col("n_rows").alias("n_rows_b"),
        F.col("digest").alias("digest_b"),
    )
    j = aa.join(bb, "bucket", "full_outer")
    return j.filter(
        ~(
            F.col("digest_a").eqNullSafe(F.col("digest_b"))
            & F.col("n_rows_a").eqNullSafe(F.col("n_rows_b"))
        )
    )


def manifest_repair(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    content_cols: list[str],
    buckets: list[int] | None = None,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Row-level delta between two copies of a table, restricted to
    the ``buckets`` a :func:`manifest_diff` flagged — the step an
    integrity pipeline runs AFTER the diff localizes divergence:
    which rows, exactly, differ. Output: ``(bucket, key, h, n_a,
    n_b)`` for every (key, row-content) multiplicity that disagrees —
    a row changed in place surfaces twice (its old digest with
    ``n_b = 0``-shaped imbalance and its new one), a dropped row once,
    a duplicated row with ``n_a != n_b``.

    Scale shape: both sides are scanned once (the bucket is computed,
    not stored, so the restriction prunes the SHUFFLE and the
    aggregate state, not the scan — at 100 TB the manifest tables
    would be written bucket-partitioned and the filter would prune
    files too); the grouped compare shuffles only the flagged
    buckets' rows, which after a localized incident are a tiny
    fraction of the corpus. With ``buckets=None`` it degrades to the
    honest full-table compare."""
    want = [int(x) for x in buckets] if buckets is not None else None

    def prep(df: DataFrame, side: str) -> DataFrame:
        h = row_digest([F.col(c) for c in content_cols])
        out = df.select(
            _key_bucket(key_col, n_buckets).alias("bucket"),
            F.col(key_col).alias("key"),
            h.alias("h"),
        )
        if want is not None:
            out = out.filter(F.col("bucket").isin(want))
        return out.groupBy("bucket", "key", "h").agg(
            F.count("*").cast("long").alias(f"n_{side}")
        )

    # NULL-SAFE full outer on (bucket, key, h): key may legitimately
    # be NULL (its bucket no longer is, see _key_bucket), and a plain
    # column-list join would report two identical NULL-key rows as a
    # bogus diff pair (r16 review)
    aa = prep(a, "a").alias("_a")
    bb = prep(b, "b").alias("_b")
    cond = (
        F.col("_a.bucket").eqNullSafe(F.col("_b.bucket"))
        & F.col("_a.key").eqNullSafe(F.col("_b.key"))
        & F.col("_a.h").eqNullSafe(F.col("_b.h"))
    )
    j = aa.join(bb, cond, "full_outer")
    return j.select(
        F.coalesce(F.col("_a.bucket"), F.col("_b.bucket")).alias("bucket"),
        F.coalesce(F.col("_a.key"), F.col("_b.key")).alias("key"),
        F.coalesce(F.col("_a.h"), F.col("_b.h")).alias("h"),
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
    ).filter(F.col("n_a") != F.col("n_b"))

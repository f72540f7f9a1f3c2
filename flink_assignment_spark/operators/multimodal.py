"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data pipeline: media payloads are opaque
``binary`` columns with a typed metadata struct; all per-item work
(decode, resize, feature-extract, frame-sample) runs as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python
row-at-a-time pickling. Partitioning contract: media rows are
re-spread before compute (bytes-dense, CPU-dense stages parallelize
by row count, not input splits).

The image/audio codec libraries are NOT in this container, so the
decode kernels are deterministic fakes behind ``_decode_image_impl``
— clearly marked; the Spark-side plumbing (schemas, UDF signatures,
batch iteration, partitioning) is real and tested. Swapping in a real
codec is a one-function change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType()),   # image | audio | video
        StructField("format", StringType()),       # png/jpeg/wav/mp4/...
        StructField("width", IntegerType()),       # images/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),    # audio/video
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURES = (
    "media_id bigint, n_bytes int, byte_mean double, byte_entropy double, phash bigint"
)


def _decode_image_impl(payload: bytes):
    """STUB — deterministic fake decode.

    Real implementation would be e.g. PIL/libvips; this container has
    no codec libs, so we surface the bytes themselves as the "pixel"
    source. Deterministic, so tests are stable.
    """
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8)


def image_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Per-image features via ``mapInPandas``: one Arrow batch in, one
    feature frame out. Shape of the real pipeline: decode → ndarray →
    vectorized stats → small row out (payload never leaves the stage).
    """

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # null payload (failed fetch upstream) -> empty stats,
                # not a stage-killing TypeError
                px = _decode_image_impl(b"" if payload is None else bytes(payload))
                n = int(px.size)
                mean = float(px.mean()) if n else 0.0
                counts = np.bincount(px, minlength=256) if n else np.zeros(256)
                p = counts[counts > 0] / max(n, 1)
                entropy = float(-(p * np.log2(p)).sum()) if n else 0.0
                # toy perceptual hash: sign bits of 64 block means
                blocks = np.array_split(px, 64) if n >= 64 else [px] * 64
                means = np.array([b.mean() if b.size else 0.0 for b in blocks])
                bits = (means > means.mean()).astype(np.int64)
                phash = int((bits << np.arange(64, dtype=np.int64)).sum())
                rows.append((int(mid), n, mean, entropy, phash))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_bytes", "byte_mean", "byte_entropy", "phash"]
            )

    spread = media.repartition(media.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(compute, schema=IMAGE_FEATURES)


AUDIO_FEATURES = (
    "media_id bigint, n_samples int, rms double, zero_crossings int, peak int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio features via ``mapInPandas`` — same stage shape
    as :func:`image_features`: decode (STUB: payload bytes as int8
    PCM samples) → vectorized waveform stats (RMS, zero-crossing
    count, peak) → skinny row out. A real decoder (soundfile/librosa,
    absent from this container) replaces only ``_decode_audio_impl``.
    """

    def compute(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # widen immediately: int8 products overflow (64*2 wraps
                # to -128 -> phantom zero crossing) and abs(-128) is
                # -128 in int8. Null payload -> empty stats.
                pcm = _decode_audio_impl(
                    b"" if payload is None else bytes(payload)
                ).astype(np.int32)
                n = int(pcm.size)
                if n:
                    rms = float(np.sqrt((pcm.astype(np.float64) ** 2).mean()))
                    zc = int(((pcm[:-1] * pcm[1:]) < 0).sum()) if n > 1 else 0
                    peak = int(np.abs(pcm).max())
                else:
                    rms, zc, peak = 0.0, 0, 0
                rows.append((int(mid), n, rms, zc, peak))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "zero_crossings", "peak"]
            )

    spread = media.repartition(media.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(compute, schema=AUDIO_FEATURES)


def _decode_audio_impl(payload: bytes):
    """STUB — deterministic fake decode: payload bytes as signed 8-bit
    PCM. Real implementation would parse the container format."""
    import numpy as np

    return np.frombuffer(payload, dtype=np.int8)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: explode each video row into
    (media_id, frame_idx, frame_ts_ms) rows from metadata alone —
    the real decoder would attach frame payloads in the same
    mapInPandas pass. Pure Catalyst here (no payload touched)."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode_outer(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
                "frame_idx"
            ),
        )
        .filter(F.col("frame_idx").isNotNull())
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
    )


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: mapInPandas pass that would re-encode payloads
    at (width, height). STUB kernel passes bytes through and rewrites
    metadata — signature, batching, and schema are the real contract."""

    out_schema = MEDIA_SCHEMA

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            metas = []
            for m in pdf["meta"]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            pdf = pdf.assign(meta=metas)
            yield pdf

    spread = media.repartition(media.sparkSession.sparkContext.defaultParallelism)
    return spread.mapInPandas(resize, schema=out_schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic media table over ``documents`` (the
    container ships no binary media fixtures): payload = utf-8 bytes
    of the text, metadata models a video whose duration tracks doc
    length. Lets the media operators run through the driver contract
    on real distributed input with reproducible values."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("n_chars").cast("long").alias("duration_ms"),
        ).alias("meta"),
    )

"""Multimodal (image/audio/video) column operators.

Design for a 100 TB training-data pipeline: media payloads are opaque
``binary`` columns with a typed metadata struct; all per-item work
(decode, resize, feature-extract, frame-sample) runs as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python
row-at-a-time pickling. Partitioning contract: media rows are
re-spread before compute (bytes-dense, CPU-dense stages parallelize
by row count, not input splits).

Decode strategy (three tiers, first match wins):

1. **Optional codec libs** — PIL for images, soundfile for audio,
   try-imported at module load; when present they decode any format
   they support. Absent from this container, but the code path is
   real and pytest exercises it wherever the lib exists
   (tests/test_multimodal.py skips otherwise).
2. **Stdlib decoders** — always available: non-interlaced 8-bit
   PNG (zlib inflate + the five standard scanline defilters,
   :func:`_decode_png`) and RIFF/WAVE PCM (the stdlib ``wave``
   module, :func:`_decode_wav`). Real decodes, byte-exact,
   dependency-free — pinned against hand-crafted files in tests.
3. **Deterministic byte-surface fallback** — payloads in formats
   neither tier handles (e.g. the synthetic text-byte fixtures)
   surface their raw bytes as the "pixel"/"sample" source, clearly
   a fake but stable, so the distributed plumbing stays testable on
   any input.
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

from .spread import spread as _spread

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


try:  # optional codec libs — tier 1 of the decode strategy
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    _PIL_Image = None
try:
    import soundfile as _soundfile  # type: ignore
except ImportError:  # pragma: no cover - environment-dependent
    _soundfile = None

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png_dims(payload: bytes):
    """Minimal real PNG decoder (stdlib only): non-interlaced, 8-bit
    depth, grayscale (color type 0) or RGB (2). zlib-inflates the
    IDAT stream and applies the five standard scanline filters
    (None/Sub/Up/Average/Paeth). Returns ``(flat_pixels, width,
    height, bpp)`` with pixels as flattened uint8 (all channels),
    identical to PIL's array for these modes. Raises ValueError on
    anything it does not support."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG")
    pos, width, height, bpp, idat = len(_PNG_MAGIC), 0, 0, 0, b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in (0, 2) or comp or filt or interlace:
                raise ValueError("unsupported PNG variant")
            bpp = 3 if color == 2 else 1
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if not (width and height and bpp):
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("bad scanline length")
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, cur = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        recon = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = recon[i - bpp] if i >= bpp else 0  # left
            b = prior[i]  # up
            c = prior[i - bpp] if i >= bpp else 0  # up-left
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            else:
                raise ValueError(f"bad filter type {ftype}")
            recon[i] = (cur[i] + pred) & 0xFF
        out[y] = recon
        prior = recon
    return out.reshape(-1), width, height, bpp


def _decode_png(payload: bytes):
    """Flat-pixel form of :func:`_decode_png_dims` (the feature
    kernels don't need the dimensions)."""
    return _decode_png_dims(payload)[0]


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def encode_png(pixels, filters: list[int] | None = None) -> bytes:
    """Minimal real PNG encoder (stdlib only), the inverse of
    :func:`_decode_png_dims`: 8-bit grayscale for a 2-D array, RGB for
    a 3-D ``(h, w, 3)`` array, one of the five standard filter types
    per scanline (default None-filter — zlib still compresses; the
    per-line predictor choice is an encoder optimization, not a
    format requirement). Round-trips byte-exactly through the
    decoder; pinned against PIL where installed."""
    import struct
    import zlib

    import numpy as np

    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w, bpp, color = *pixels.shape, 1, 0
        flat = pixels
    else:
        h, w, _ = pixels.shape
        bpp, color = 3, 2
        flat = pixels.reshape(h, w * 3)
    filters = filters or [0] * h
    raw = bytearray()
    prior = np.zeros(w * bpp, dtype=np.int32)
    for y in range(h):
        line = flat[y].astype(np.int32)
        ft = filters[y]
        enc = np.zeros(w * bpp, dtype=np.int32)
        for i in range(w * bpp):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_wav(payload: bytes):
    """Real RIFF/WAVE PCM decode via the stdlib ``wave`` module:
    returns channel-0 samples as int16 (8-bit files are widened,
    centred at 0 per the WAV unsigned-8-bit convention). Raises on
    non-WAV payloads."""
    import io
    import wave

    import numpy as np

    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise ValueError("not a WAV")
    with wave.open(io.BytesIO(payload)) as w:
        n_ch, sw = w.getnchannels(), w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if sw == 2:
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.int16)
    elif sw == 1:
        pcm = (np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128) * 256
    else:
        raise ValueError(f"unsupported sample width {sw}")
    return pcm[::n_ch] if n_ch > 1 else pcm


def _decode_image_impl(payload: bytes):
    """Tiered decode — PIL when installed, the stdlib PNG decoder for
    PNG payloads, else the deterministic byte-surface fallback (raw
    bytes as the 'pixel' source; clearly a fake, but stable, so the
    distributed plumbing is testable on synthetic non-image
    payloads)."""
    import numpy as np

    if _PIL_Image is not None and payload:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im).astype(np.uint8).reshape(-1)
        except Exception:
            pass  # not decodable media → fall through
    if payload.startswith(_PNG_MAGIC):
        try:
            return _decode_png(payload)
        except ValueError:
            pass  # unsupported PNG variant → byte surface
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

    spread = _spread(media)
    return spread.mapInPandas(compute, schema=IMAGE_FEATURES)


AUDIO_FEATURES = (
    "media_id bigint, n_samples int, rms double, zero_crossings int, peak int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Per-clip audio features via ``mapInPandas`` — same stage shape
    as :func:`image_features`: tiered decode (soundfile when
    installed, stdlib WAV always, int8 byte-surface fallback — see
    ``_decode_audio_impl``) → vectorized waveform stats (RMS,
    zero-crossing count, peak) → skinny row out.
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

    spread = _spread(media)
    return spread.mapInPandas(compute, schema=AUDIO_FEATURES)


def _decode_audio_impl(payload: bytes):
    """Tiered decode — soundfile when installed, the stdlib ``wave``
    decoder for RIFF/WAVE payloads, else the deterministic fallback
    (payload bytes as signed 8-bit PCM)."""
    import numpy as np

    if _soundfile is not None and payload:
        import io

        try:
            data, _sr = _soundfile.read(io.BytesIO(payload), dtype="int16")
            return data[:, 0] if getattr(data, "ndim", 1) > 1 else data
        except Exception:
            pass  # not decodable audio → fall through
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        try:
            return _decode_wav(payload)
        except Exception:
            pass  # malformed/unsupported WAV → byte surface
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


def _nn_indices(dst: int, src: int):
    """Nearest-neighbor source index per destination index, PIL's
    pixel-center convention: ``src_i = floor((dst_i + 0.5) * scale)``
    — so the stdlib tier and the PIL tier produce the same pixels."""
    import numpy as np

    return np.minimum(
        ((np.arange(dst) + 0.5) * (src / dst)).astype(np.int64), src - 1
    )


def _resize_image_impl(payload: bytes, width: int, height: int):
    """Tiered REAL resize — returns ``(new_payload, resized)``:

    1. PIL when installed: decode any supported format, NEAREST
       resample, re-encode in the source format (PNG fallback).
    2. stdlib for PNG payloads: :func:`_decode_png_dims` →
       vectorized nearest-neighbor index gather (the same
       pixel-center rule as PIL's NEAREST) → :func:`encode_png`.
    3. anything neither tier decodes passes through unchanged with
       ``resized=False`` (deterministic, never raises — the Arrow
       stage must survive corrupt payloads)."""
    if _PIL_Image is not None and payload:
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                fmt = im.format or "PNG"
                out = im.resize((width, height), _PIL_Image.NEAREST)
                buf = io.BytesIO()
                out.save(buf, format=fmt)
                return buf.getvalue(), True
        except Exception:
            pass  # not decodable media → fall through
    if payload.startswith(_PNG_MAGIC):
        try:
            flat, w0, h0, bpp = _decode_png_dims(payload)
            arr = flat.reshape(h0, w0, bpp)
            res = arr[_nn_indices(height, h0)][:, _nn_indices(width, w0)]
            return encode_png(res if bpp == 3 else res[:, :, 0]), True
        except ValueError:
            pass  # unsupported PNG variant → pass through
    return payload, False


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image payload to (width, height) in one
    Arrow-batched ``mapInPandas`` pass — REAL re-encoded pixels via
    the tiered kernel (:func:`_resize_image_impl`); payloads no tier
    decodes pass through byte-identical. Metadata width/height are
    rewritten only for rows actually resized, so downstream consumers
    can trust the meta to describe the payload."""

    out_schema = MEDIA_SCHEMA

    def resize(batches):
        for pdf in batches:
            payloads, metas = [], []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                raw = b"" if payload is None else bytes(payload)
                new_payload, resized = _resize_image_impl(raw, width, height)
                payloads.append(new_payload if payload is not None else None)
                m = dict(m) if m is not None else {}
                if resized:
                    m["width"], m["height"] = width, height
                metas.append(m)
            yield pdf.assign(payload=payloads, meta=metas)

    spread = _spread(media)
    return spread.mapInPandas(resize, schema=out_schema)


def media_from_documents(docs: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Deterministic synthetic media table over ``documents`` (the
    container ships no binary media fixtures): payload = utf-8 bytes
    of the text, metadata models a video whose duration tracks doc
    length. Lets the media operators run through the driver contract
    on real distributed input with reproducible values. ``keep_cols``
    carries extra document columns through (e.g. ``source`` for
    per-source media rollups) without a join back."""
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
        *[F.col(c) for c in keep_cols],
    )

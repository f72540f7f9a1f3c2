"""Multimodal plumbing tests: schemas, Arrow batching, partition
spread, and deterministic fake kernels (decode itself is stubbed —
no codec libs in this environment)."""

from __future__ import annotations

from flink_assignment_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    frame_sample,
    image_features,
    resize_images,
)

from .conftest import SF_DIR


def _media_df(spark, n=20):
    rows = [
        (
            i,
            bytes([(i * 7 + j) % 256 for j in range(256 + i)]),
            {
                "media_type": "video" if i % 3 == 0 else "image",
                "format": "mp4" if i % 3 == 0 else "png",
                "width": 64,
                "height": 48,
                "duration_ms": 3500 if i % 3 == 0 else None,
            },
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_deterministic(spark):
    df = _media_df(spark)
    rows = {r.media_id: r for r in image_features(df).collect()}
    assert len(rows) == 20
    r0 = rows[0]
    assert r0.n_bytes == 256
    assert 0 <= r0.byte_mean <= 255
    assert r0.byte_entropy > 0
    # rerun → identical (stub decode is deterministic)
    again = {r.media_id: r for r in image_features(df).collect()}
    assert all(tuple(rows[k]) == tuple(again[k]) for k in rows)


def test_frame_sample_counts(spark):
    df = _media_df(spark)
    frames = frame_sample(df, every_ms=1000).collect()
    videos = [r for r in df.collect() if r.meta.media_type == "video"]
    # 3500 ms at 1 fps → frames 0,1,2 (idx < duration//1000)
    assert len(frames) == len(videos) * 3
    assert {f.frame_ts_ms for f in frames} == {0, 1000, 2000}


def test_resize_rewrites_meta_keeps_payload(spark):
    df = _media_df(spark)
    out = {r.media_id: r for r in resize_images(df, 32, 32).collect()}
    orig = {r.media_id: r for r in df.collect()}
    assert out.keys() == orig.keys()
    for k in out:
        assert bytes(out[k].payload) == bytes(orig[k].payload)
        assert (out[k].meta.width, out[k].meta.height) == (32, 32)
        assert out[k].meta.media_type == orig[k].meta.media_type


def test_audio_features_deterministic_and_matches_numpy(spark):
    """Waveform stats through the Arrow stage equal a local numpy
    computation on the same payload bytes, twice (determinism)."""
    import numpy as np

    from flink_assignment_spark.operators.multimodal import audio_features

    df = _media_df(spark)
    payloads = {
        i: bytes([(i * 7 + j) % 256 for j in range(256 + i)]) for i in range(20)
    }
    for _ in range(2):
        rows = {r.media_id: r for r in audio_features(df).collect()}
        assert set(rows) == set(payloads)
        for mid, payload in payloads.items():
            # widened reference math — int8 products would overflow
            pcm = np.frombuffer(payload, dtype=np.int8).astype(np.int32)
            r = rows[mid]
            assert r.n_samples == pcm.size
            assert abs(r.rms - float(np.sqrt((pcm.astype(np.float64) ** 2).mean()))) < 1e-12
            assert r.zero_crossings == int(((pcm[:-1] * pcm[1:]) < 0).sum())
            assert r.peak == int(np.abs(pcm).max())
            assert r.peak <= 128  # int8 domain, abs(-128) handled


def test_null_payload_yields_empty_stats_not_crash(spark):
    """A null payload (failed upstream fetch) must produce zeroed
    feature rows, not kill the Arrow stage."""
    from flink_assignment_spark.operators.multimodal import audio_features

    rows = [(0, None, {"media_type": "image", "format": "png",
                       "width": 1, "height": 1, "duration_ms": None}),
            (1, b"\x01\x02", {"media_type": "image", "format": "png",
                              "width": 1, "height": 1, "duration_ms": None})]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    img = {r.media_id: r for r in image_features(df).collect()}
    assert img[0].n_bytes == 0 and img[0].byte_mean == 0.0
    assert img[1].n_bytes == 2
    aud = {r.media_id: r for r in audio_features(df).collect()}
    assert aud[0].n_samples == 0 and aud[0].rms == 0.0
    assert aud[1].n_samples == 2


def test_media_neardup_exact_recall_vs_bruteforce(spark):
    """q85's pigeonhole-blocked Hamming join must find EXACTLY the
    pairs a brute-force popcount over all eligible phash pairs finds
    (payloads ≥ MEDIA_MIN_BYTES — tinier ones share the stub's
    degenerate zero phash and are excluded by the query). The test
    also asserts the hot-cell cap never fires at this scale, so the
    exact-equality compare is not vacuous."""
    from collections import Counter

    from flink_assignment_spark.queries.synthetic import (
        MEDIA_MAX_BLOCK_BUCKET,
        MEDIA_MIN_BYTES,
        MEDIA_PHASH_MAX_HAMMING,
        REGISTRY,
    )

    got = {
        (r.media_a, r.media_b): r.hamming
        for r in REGISTRY["q85_media_neardup"].spark(spark, SF_DIR).collect()
    }
    from flink_assignment_spark.operators.multimodal import (
        image_features,
        media_from_documents,
    )
    from flink_assignment_spark.sources.loaders import load_table

    feats = (
        image_features(media_from_documents(load_table(spark, SF_DIR, "documents")))
        .select("media_id", "n_bytes", "phash")
        .collect()
    )
    fps = [(r.media_id, r.phash) for r in feats if r.n_bytes >= MEDIA_MIN_BYTES]
    assert len(fps) < len(feats), "fixture should contain sub-threshold payloads"
    # the cap must be inert at this scale for exact-recall equality
    n_blocks = MEDIA_PHASH_MAX_HAMMING + 1
    w = 64 // n_blocks
    cells = Counter()
    for _, fp in fps:
        u = fp & ((1 << 64) - 1)
        for i in range(n_blocks):
            lo = i * w
            width = w if i < n_blocks - 1 else 64 - lo
            cells[(i, (u >> lo) & ((1 << width) - 1))] += 1
    assert max(cells.values()) <= MEDIA_MAX_BLOCK_BUCKET
    want = {}
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            (ia, fa), (ib, fb) = fps[i], fps[j]
            d = bin((fa ^ fb) & ((1 << 64) - 1)).count("1")
            if d <= MEDIA_PHASH_MAX_HAMMING:
                a, b = min(ia, ib), max(ia, ib)
                want[(a, b)] = d
    assert got == want and len(want) > 0

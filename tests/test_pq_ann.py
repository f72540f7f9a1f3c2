"""Product-quantization ANN: recall against the exact answer,
artifact round-trip, determinism, ADC-kernel parity with a numpy
reference, and the mismatched-artifact guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_assignment_spark.operators.similarity import (
    cosine_topk,
    load_pq,
    load_pq_codes,
    pq_encode,
    pq_fingerprint,
    pq_probe,
    pq_topk,
    pq_train,
    save_pq,
    save_pq_codes,
)
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def artifacts(spark, emb, tmp_path_factory):
    """Codebooks + codes, with the codes served from the DISK artifact
    (save → load round-trip), so every downstream PQ test — ADC
    parity, recall, determinism, streaming probe — consumes the loaded
    frame without re-encoding, the full production path."""
    cb = pq_train(emb)
    path = str(tmp_path_factory.mktemp("pq") / "codes")
    save_pq_codes(pq_encode(emb, cb), path, cb)
    return cb, load_pq_codes(spark, path, cb)


def test_pq_train_deterministic_and_shaped(emb):
    cb1, cb2 = pq_train(emb), pq_train(emb)
    assert cb1.shape == (16, 256, 4)
    assert np.array_equal(cb1, cb2)


def test_pq_artifact_roundtrip(tmp_path, artifacts):
    cb, _ = artifacts
    path = str(tmp_path / "pq.json")
    save_pq(path, cb)
    assert np.array_equal(load_pq(path), cb)


def test_pq_codes_artifact_roundtrip(spark, emb, artifacts, tmp_path):
    """The codes frame survives the parquet round-trip row-for-row
    (16 one-byte codes per vector — the expensive encode pass is paid
    once, the artifact is what every later session probes)."""
    cb, _ = artifacts
    fresh = pq_encode(emb, cb)
    path = str(tmp_path / "codes")
    save_pq_codes(fresh, path, cb)
    loaded = load_pq_codes(spark, path, cb, materialize=False)
    a = {r.neighbor_id: list(r.code) for r in fresh.collect()}
    b = {r.neighbor_id: list(r.code) for r in loaded.collect()}
    assert a == b


def test_pq_codes_mismatched_codebooks_refused(spark, emb, artifacts, tmp_path):
    """A codes artifact encoded by DIFFERENT codebooks is refused at
    load (fingerprint mismatch): ADC lookup tables from an unmatched
    codebook silently mis-rank every probe. A blue/green codebook swap
    therefore forces a re-encode, after which the new pair loads."""
    cb, codes = artifacts
    path = str(tmp_path / "codes")
    save_pq_codes(codes, path, cb)
    other_cb = pq_train(emb, m=8)  # different geometry ⇒ different fp
    assert pq_fingerprint(other_cb) != pq_fingerprint(cb)
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        load_pq_codes(spark, path, other_cb)
    # blue/green: re-encode under the new codebooks, swap, reload
    save_pq_codes(pq_encode(emb, other_cb), path, other_cb)
    swapped = load_pq_codes(spark, path, other_cb, materialize=False)
    assert swapped.count() == codes.count()
    # and a directory that is not a codes artifact is refused too
    import os

    bare = str(tmp_path / "bare")
    codes.write.parquet(bare)
    assert not os.path.exists(os.path.join(bare, "_PQ_CODES_META.json"))
    with pytest.raises(ValueError, match="not a PQ codes artifact"):
        load_pq_codes(spark, bare, cb)


def test_pq_codes_in_range_and_deterministic(artifacts):
    _, codes = artifacts
    rows = codes.collect()
    assert all(len(r.code) == 16 for r in rows)
    assert all(0 <= c < 256 for r in rows for c in r.code)
    again = {r.neighbor_id: list(r.code) for r in rows}
    rows2 = {r.neighbor_id: list(r.code) for r in codes.collect()}
    assert again == rows2


def test_pq_adc_matches_numpy_reference(spark, emb, artifacts):
    """The distributed ADC score must equal the straight numpy
    reconstruction score: cos(q, x_hat) with x_hat the concatenated
    sub-centroids."""
    cb, codes = artifacts
    q = emb.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.neighbor_id): r.adc_sim
        for r in pq_probe(q, cb, codes, k=3).collect()
    }
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    code_map = {r.neighbor_id: list(r.code) for r in codes.collect()}
    recon = {
        i: np.concatenate([cb[j, c] for j, c in enumerate(code_map[i])])
        for i in code_map
    }
    for (qid, nid), sim in got.items():
        qv, xh = vecs[qid], recon[nid]
        want = float(qv @ xh / (np.linalg.norm(qv) * np.linalg.norm(xh)))
        assert abs(sim - round(want, 6)) < 2e-6, (qid, nid)


def test_pq_topk_recall_vs_exact(spark, emb, artifacts):
    """Recall@5 of the shortlist-50 re-ranked answer vs the exact
    cosine top-5. 1.0 at sf0.1 under the defaults; pinned at >= 0.9
    to absorb corpus regeneration."""
    cb, codes = artifacts
    q = emb.filter(F.col("vec_id") < 20)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(q, emb, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in pq_topk(q, emb, k=5, codebooks=cb, codes=codes).collect()
    }
    assert len(approx & exact) / len(exact) >= 0.9
    # the re-ranked scores are EXACT cosines: every overlapping pair
    # carries the same cos_sim as the brute-force answer
    ex_sim = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in cosine_topk(q, emb, k=5).collect()
    }
    for r in pq_topk(q, emb, k=5, codebooks=cb, codes=codes).collect():
        key = (r.query_id, r.neighbor_id)
        if key in ex_sim:
            assert r.cos_sim == ex_sim[key]


def test_pq_topk_deterministic(emb, artifacts):
    cb, codes = artifacts
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, pq_topk(q, emb, k=5, codebooks=cb, codes=codes).collect()))
    b = sorted(map(tuple, pq_topk(q, emb, k=5, codebooks=cb, codes=codes).collect()))
    assert a == b


def test_pq_codes_without_codebooks_refused(emb, artifacts):
    _, codes = artifacts
    q = emb.filter(F.col("vec_id") < 5)
    with pytest.raises(ValueError, match="codebooks"):
        pq_topk(q, emb, k=5, codes=codes)


def test_pq_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7)


def test_pq_stream_probe_matches_batch(spark, emb, artifacts, tmp_path):
    """The streaming PQ probe (direct merge calls, the other ANN
    streams' test shape) reproduces batch pq_topk row-for-row against
    the same frozen artifacts, and a stale redelivery is a marker
    no-op."""
    from flink_assignment_spark.streaming.ann_stream import (
        probe_pq_batch,
        read_ann_results,
    )

    cb, codes = artifacts
    queries = emb.filter(F.col("vec_id") < 12)
    want = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in pq_topk(queries, emb, k=5, codebooks=cb, codes=codes).collect()
    }
    assert want

    state = str(tmp_path / "pqstate")
    rows = queries.collect()
    schema = "vec_id long, embedding array<float>, label int"
    for b, i in enumerate(range(0, len(rows), 4)):
        probe_pq_batch(
            spark.createDataFrame(rows[i : i + 4], schema), b, state, cb, codes, emb, 5
        )
    got = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in read_ann_results(spark, state).collect()
    }
    assert got == want
    # stale redelivery — marker skip, results unchanged
    probe_pq_batch(
        spark.createDataFrame(rows[:4], schema), 0, state, cb, codes, emb, 5
    )
    again = {
        (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
        for r in read_ann_results(spark, state).collect()
    }
    assert again == want

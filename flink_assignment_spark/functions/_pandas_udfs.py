"""Arrow-batched Pandas UDFs.

Kept in a module WITHOUT ``from __future__ import annotations`` —
PySpark infers the UDF eval type from real (non-stringized) type
hints.
"""

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf


def make_pair_dot_udf():
    """Σ a[i]·b[i] per row in double precision with SEQUENTIAL
    summation (``cumsum`` is a left-to-right scan) — bit-identical to
    a left-associated Catalyst/SQL sum, but vectorized numpy over
    Arrow batches. Used on pairwise-similarity hot paths where the
    64-term generated expression would overflow JIT method limits."""

    @pandas_udf("double")
    def pair_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.values).astype(np.float64)
        B = np.stack(b.values).astype(np.float64)
        return pd.Series((A * B).cumsum(axis=1)[:, -1])

    return pair_dot


def make_lsh_buckets_udf(weights):
    """Bucket ids for all LSH tables at once: V @ W.T sign bits packed
    per table. ``weights`` is a prebuilt (n_tables, n_planes, dim)
    float64 ndarray of deterministic hyperplane weights; the matmul
    replaces an n_tables*n_planes*dim-term Catalyst expression whose
    plan compilation alone dominates runtime."""
    n_tables, n_planes, dim = weights.shape
    W = weights.reshape(n_tables * n_planes, dim)

    @pandas_udf("array<int>")
    def buckets(v: pd.Series) -> pd.Series:
        V = np.stack(v.values).astype(np.float64)
        S = (V @ W.T) > 0  # (rows, tables*planes)
        S = S.reshape(len(V), n_tables, n_planes)
        packed = (S.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=2)
        return pd.Series(list(packed.astype(np.int32)))

    return buckets


def _pair_cos(R, C):
    """(rows, corpus) cosine matrix with a LEFT-ASSOCIATIVE dim fold.

    The dot product is accumulated one dimension at a time — the
    identical fold order to ``cumsum(...)[..., -1]`` and to the SQL
    oracle's left-associated ``a[1]*b[1] + a[2]*b[2] + ...`` sum, so
    the UNROUNDED cosine is bit-identical across engines — WITHOUT
    materializing the (rows, corpus, dim) 3-D intermediate (the 2-D
    accumulator stays cache-resident, ~10x faster)."""
    r_norms = np.sqrt((R * R).cumsum(axis=1)[:, -1])
    c_norms = np.sqrt((C * C).cumsum(axis=1)[:, -1])
    acc = R[:, 0, None] * C[None, :, 0]
    for d in range(1, C.shape[1]):
        acc += R[:, d, None] * C[None, :, d]
    return acc / (r_norms[:, None] * c_norms[None, :])


def make_block_topk_scorer(bc_blocks, k):
    """mapInPandas kernel for exact bounded-query top-k
    (:func:`~..operators.similarity.cosine_topk`): the corpus streams
    through as (id, vec) Arrow batches; each batch scores against a
    BROADCAST list of query (ids, matrix, ids) blocks — the same
    sharded fold as :func:`make_block_hardneg_scorer`, of which this
    is the labels=ids special case: masking same-LABEL pairs with
    label := id masks exactly the self-pairs, and the per-block
    slack-banded per-query top-k emission (batches × |Q| × k Arrow
    rows, not N × |Q|) composes under the single downstream ranking
    window because blocks partition the query ids. Exactness argument
    verbatim from the hardneg kernel; values are raw
    :func:`_pair_cos` cosines, rounding stays engine-side."""

    def score(batches):
        blocks = bc_blocks.value
        for pdf in batches:
            if not len(pdf):
                continue
            rows_id = pdf.iloc[:, 0].values.astype(np.int64)
            R = np.stack(pdf.iloc[:, 1].values).astype(np.float64)
            for q_ids, Q, q_labels in blocks:
                yield _hardneg_block_emit(rows_id, R, rows_id, q_ids, Q, q_labels, k)

    return score


def make_block_max_scorer(bc_blocks):
    """mapInPandas kernel emitting ONE row per stream row: its max raw
    cosine against a BROADCAST list of probe matrix blocks, folded with
    a running max — per-task memory is bounded by ONE
    (batch_rows × block_rows) cosine matrix no matter how many blocks
    the probe set sharded into. The per-row reduction happens INSIDE
    the kernel, so the consumer needs no aggregate exchange at all —
    a stateless narrow map, batch/stream portable verbatim.

    No id masking: probes and corpus are DISTINCT datasets by contract
    (an eval benchmark vs a training corpus), so id equality across
    them is meaningless — masking on it silently dropped a real probe
    whenever the two tables' id spaces collided (both commonly start
    at 0), a false NEGATIVE in a never-miss gate.

    Exactness: the unrounded cosines follow :func:`_pair_cos`'s shared
    fold; per-block max and the cross-block running max are exact
    selection (no arithmetic fold), so
    ``max(blocks, max(rows))  ==  max(all rows)`` and the engine-side
    ``round(max_cos, 6)`` equals the oracle's ``max(round(cos, 6))``
    (rounding is monotone)."""

    def score(batches):
        blocks = bc_blocks.value
        for pdf in batches:
            if not len(pdf):
                continue
            rows_id = pdf.iloc[:, 0].values.astype(np.int64)
            R = np.stack(pdf.iloc[:, 1].values).astype(np.float64)
            best = np.full(len(rows_id), -np.inf, dtype=np.float64)
            for B in blocks:
                np.maximum(best, _pair_cos(R, B).max(axis=1), out=best)
            yield pd.DataFrame({"id": rows_id, "max_cos": best})

    return score


def make_self_block_pair_scorer(min_cos: float | None = None):
    """applyInPandas kernel for blocked all-pairs self-scoring.

    One group = one unordered block pair (gi, gj) of the corpus; the
    group's rows are the union of both blocks (tagged ``_blk``), so
    per-task memory is bounded by two block sizes no matter the corpus
    size. Every unordered id pair lives in exactly one group (blocks
    partition the ids), emitted once as (id_a = min, id_b = max).
    Exactness per :func:`_pair_cos` (cosine is dim-fold symmetric in
    its arguments, so pair orientation cannot change the value).

    ``min_cos`` pushes the near-dup threshold INTO the kernel: only
    pairs with raw cosine ≥ min_cos are emitted, cutting Arrow
    emission from N²/2 rows to the near-dup count. The caller passes
    ``threshold − 2e-6``: any pair the engine-side
    ``round(cos, 6) ≥ threshold`` filter would keep has raw cosine
    ≥ threshold − 5e-7 > min_cos, so the pre-filter is a provable
    superset of the final result and exactness is unchanged.
    """

    def _empty():
        return pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
                "cos_sim": np.array([], dtype=np.float64),
            }
        )

    def score(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        A = pdf[pdf["_blk"] == gi]
        ids_a = A["_id"].values.astype(np.int64)
        if gi == gj:
            if len(ids_a) < 2:
                return _empty()
            R = np.stack(A["_v"].values).astype(np.float64)
            cos = _pair_cos(R, R)
            mask = ids_a[:, None] < ids_a[None, :]
            if min_cos is not None:
                mask &= cos >= min_cos
            ii, jj = np.nonzero(mask)
            return pd.DataFrame(
                {"id_a": ids_a[ii], "id_b": ids_a[jj], "cos_sim": cos[ii, jj]}
            )
        B = pdf[pdf["_blk"] == gj]
        ids_b = B["_id"].values.astype(np.int64)
        if not len(ids_a) or not len(ids_b):
            return _empty()
        R = np.stack(A["_v"].values).astype(np.float64)
        C = np.stack(B["_v"].values).astype(np.float64)
        cos = _pair_cos(R, C)
        if min_cos is not None:
            mask = cos >= min_cos
        else:
            mask = np.ones((len(ids_a), len(ids_b)), dtype=bool)
        ii, jj = np.nonzero(mask)
        ia, ib = ids_a[ii], ids_b[jj]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "cos_sim": cos[ii, jj],
            }
        )

    return score


def make_self_block_topk_scorer(k: int):
    """applyInPandas kernel for blocked exact kNN: per unordered block
    pair, emit each vector's top-k neighbor CANDIDATES by raw cosine
    with a 2e-6 slack band, instead of every scored pair — N·blocks·k
    output rows instead of N²/2, which is what keeps the downstream
    global window small.

    Exactness argument (downstream ranks by ``round(cos, 6) DESC,
    neighbor_id ASC``): if a candidate Y is NOT emitted for query X
    from a group containing both, then ≥k candidates in that group
    score raw > cos(X,Y) + 2e-6, hence rounded ≥ cos(X,Y) + 1.5e-6 >
    round(cos(X,Y)) (|round(v)−v| ≤ 5e-7), i.e. STRICTLY greater
    rounded values — so X already has ≥k globally better neighbors and
    Y cannot be in X's global top-k. The union of per-group emissions
    therefore contains every global top-k row; the final window cut is
    exact. Values are raw ``_pair_cos`` cosines (bit-identical fold);
    rounding stays engine-side.
    """
    SLACK = 2e-6

    def _empty():
        return pd.DataFrame(
            {
                "query_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "cos_sim": np.array([], dtype=np.float64),
            }
        )

    def _emit(q_ids, nbr_ids, cos, kk):
        n = cos.shape[1]
        kth = np.partition(cos, n - kk, axis=1)[:, n - kk]
        ii, jj = np.nonzero(cos >= (kth - SLACK)[:, None])
        return pd.DataFrame(
            {
                "query_id": q_ids[ii],
                "neighbor_id": nbr_ids[jj],
                "cos_sim": cos[ii, jj],
            }
        )

    def score(key, pdf):
        gi, gj = int(key[0]), int(key[1])
        A = pdf[pdf["_blk"] == gi]
        ids_a = A["_id"].values.astype(np.int64)
        if gi == gj:
            if len(ids_a) < 2:
                return _empty()
            R = np.stack(A["_v"].values).astype(np.float64)
            cos = _pair_cos(R, R)
            # self-pairs excluded via -inf: kk ≤ n−1 keeps the k-th
            # threshold real, and -inf can never clear (kth − slack)
            np.fill_diagonal(cos, -np.inf)
            return _emit(ids_a, ids_a, cos, min(k, len(ids_a) - 1))
        B = pdf[pdf["_blk"] == gj]
        ids_b = B["_id"].values.astype(np.int64)
        if not len(ids_a) or not len(ids_b):
            return _empty()
        R = np.stack(A["_v"].values).astype(np.float64)
        C = np.stack(B["_v"].values).astype(np.float64)
        cos = _pair_cos(R, C)
        # both kNN orientations from one scored matrix (per-dim
        # products commute exactly, so the transpose is bit-identical)
        return pd.concat(
            [
                _emit(ids_a, ids_b, cos, min(k, len(ids_b))),
                _emit(ids_b, ids_a, cos.T, min(k, len(ids_a))),
            ],
            ignore_index=True,
        )

    return score


def _hardneg_block_emit(rows_id, R, labs, q_ids, Q, q_labels, k):
    """One (corpus batch × anchor block) hard-negative emission: score,
    mask SAME-label pairs to -inf (a hard negative must be a different
    class; self-pairs share their label so the mask subsumes
    self-exclusion), and emit only each anchor's per-batch top-k
    candidates inside the 2e-6 slack band."""
    SLACK = 2e-6
    cos = _pair_cos(R, Q)  # (rows, block anchors)
    cos[labs[:, None] == q_labels[None, :]] = -np.inf
    n = cos.shape[0]
    if n > k:
        kth = np.partition(cos, n - k, axis=0)[n - k]  # per anchor
    else:
        kth = np.full(cos.shape[1], -np.inf)
    sel = (cos >= (kth - SLACK)[None, :]) & np.isfinite(cos)
    ii, jj = np.nonzero(sel)
    return pd.DataFrame(
        {
            "query_id": q_ids[jj],
            "neighbor_id": rows_id[ii],
            "cos_sim": cos[ii, jj],
        }
    )


def make_block_hardneg_scorer(bc_blocks, k):
    """mapInPandas kernel for hard-negative mining: the corpus streams
    through as (id, vec, label) Arrow batches; each batch scores
    against a BROADCAST list of anchor (ids, matrix, labels) blocks —
    the sharded form that lifted semantic_contamination's 65,536-row
    probe cliff, applied to the anchor side: per-task memory is
    bounded by ONE (batch × block) cosine matrix no matter how many
    blocks the anchor set sharded into, and Arrow emission is
    batches × |Q| × k rows (slack-banded per-block top-k), not
    N × |Q|. Blocks PARTITION the anchor ids, so each anchor's
    candidates come from exactly one block per batch and the per-block
    emissions compose under the single downstream ranking window
    without any cross-block fold.

    Exactness (downstream ranks by ``round(cos, 6) DESC, neighbor_id
    ASC``): if candidate Y is not emitted for anchor X from Y's batch,
    then >= k same-anchor candidates in that batch score raw
    > cos(X,Y) + 2e-6, hence rounded STRICTLY greater — so Y cannot be
    in X's global top-k and the union of per-batch emissions contains
    every global top-k row (the make_self_block_topk_scorer argument,
    batch-wise). Values are raw :func:`_pair_cos` cosines; rounding
    stays engine-side."""

    def score(batches):
        blocks = bc_blocks.value
        for pdf in batches:
            if not len(pdf):
                continue
            rows_id = pdf.iloc[:, 0].values.astype(np.int64)
            R = np.stack(pdf.iloc[:, 1].values).astype(np.float64)
            labs = pdf.iloc[:, 2].values.astype(np.int64)
            for q_ids, Q, q_labels in blocks:
                yield _hardneg_block_emit(rows_id, R, labs, q_ids, Q, q_labels, k)

    return score


def make_cell_assign_udf(centroids, n_nearest):
    """array<int> of the ``n_nearest`` centroid ids by L2 distance —
    one numpy pass per Arrow batch (IVF cell assignment / probing)."""
    C = centroids.astype(np.float64)

    @pandas_udf("array<int>")
    def assign(v: pd.Series) -> pd.Series:
        V = np.stack(v.values).astype(np.float64)
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d2, axis=1, kind="stable")[:, :n_nearest]
        return pd.Series(list(order.astype(np.int32)))

    return assign


def make_zlib_len_udf(level=6):
    """Compressed byte length of each string under zlib at ``level``.

    The compression *ratio* (deflate bytes / raw bytes) is a byte-level
    data-quality proxy complementary to the word-level Gopher
    repetition filter: highly compressible text is boilerplate or
    looped spam, near-incompressible text is base64/random noise.
    zlib is in the CPython stdlib, the output length is deterministic
    for a fixed level, and the work is per-row-bounded, so an Arrow
    batch UDF is the right shape — the ratio itself and all banding
    stays JVM-side."""

    @pandas_udf("long")
    def zlib_len(s: pd.Series) -> pd.Series:
        import zlib

        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level))
            if t is not None
            else None
        ).astype("Int64")

    return zlib_len

def make_probe_clean_udf(bc_probe):
    """True iff NONE of the row's shingle hashes is in the broadcast
    probe set — the streaming decontamination filter (the batch form
    is a broadcast anti-join; a stream cannot anti-join a set derived
    from itself)."""

    @pandas_udf("boolean")
    def probe_clean(sh_arrays: pd.Series) -> pd.Series:
        ph = bc_probe.value
        return sh_arrays.apply(
            lambda arr: arr is None or all(h not in ph for h in arr)
        )

    return probe_clean


def make_pq_encode_udf(codebooks):
    """array<int> of the ``m`` nearest-sub-centroid codes per vector —
    product-quantization encoding, one numpy pass per Arrow batch.
    ``codebooks`` is (m, n_codes, dsub); each vector splits into m
    contiguous dsub-blocks and each block snaps to its codebook's
    nearest row by L2 (argmin is deterministic: ties take the lowest
    code)."""
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = C.shape
    c_sq = (C**2).sum(axis=2)  # (m, n_codes)

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        V = np.stack(v.values).astype(np.float64).reshape(len(v), m, dsub)
        # d2[n, j, c] via the ||a-b||^2 expansion, no (n, j, c, d) 4-D
        cross = np.einsum("njd,jcd->njc", V, C)
        d2 = (V**2).sum(axis=2)[:, :, None] + c_sq[None, :, :] - 2.0 * cross
        codes = d2.argmin(axis=2).astype(np.int32)  # (n, m)
        return pd.Series(list(codes))

    return encode


def make_pq_adc_scorer(codebooks, query_blocks, k):
    """mapInPandas kernel scoring PQ codes against a frozen query
    block by ASYMMETRIC DISTANCE COMPUTATION: per query a (m, n_codes)
    lookup table of sub-dot-products, so a candidate's approximate
    dot is m table lookups instead of a dim-length multiply, and its
    reconstructed norm is exact from the codebook norms (the m
    sub-blocks are orthogonal coordinate slices, so ||x_hat||^2 =
    sum_j ||c_j||^2). Emits each Arrow batch's per-query top-k
    (query_id, neighbor_id, adc_sim) — exact for the global top-k
    under the fixed ADC score, so the downstream ranking window reads
    batches x |Q| x k rows, never N x |Q| (the hard-negatives
    emission shape)."""
    C = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, n_codes, dsub = C.shape
    c_sq = (C**2).sum(axis=2)  # (m, n_codes)
    blocks = []
    for q_ids, q_mat, _ in query_blocks.blocks:
        qsub = q_mat.reshape(len(q_ids), m, dsub)
        lut = np.einsum("qjd,jcd->qjc", qsub, C)  # (Q, m, n_codes)
        q_norm = np.sqrt((q_mat**2).sum(axis=1))
        blocks.append((q_ids, lut, q_norm))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["code"].values).astype(np.int64)  # (n, m)
            x_norm = np.sqrt(
                c_sq[np.arange(m)[None, :], codes].sum(axis=1)
            )  # (n,)
            outs = []
            for q_ids, lut, q_norm in blocks:
                dot = np.zeros((len(q_ids), len(ids)), dtype=np.float64)
                for j in range(m):
                    dot += lut[:, j, :][:, codes[:, j]]
                sim = dot / (
                    q_norm[:, None] * np.maximum(x_norm[None, :], 1e-30)
                )
                sim[q_ids[:, None] == ids[None, :]] = -np.inf  # self-pairs
                kk = min(k, sim.shape[1])
                top = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
                rows_q = np.repeat(q_ids, kk)
                cols = top.ravel()
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": rows_q,
                            "neighbor_id": ids[cols],
                            "adc_sim": sim[
                                np.repeat(np.arange(len(q_ids)), kk), cols
                            ],
                        }
                    )
                )
            out = pd.concat(outs, ignore_index=True)
            yield out[np.isfinite(out["adc_sim"].to_numpy())]

    return score

"""Heavy-hitters exactness under adversarial partitioning, and the
asymmetric containment case symmetric Jaccard structurally misses."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs
from flink_assignment_spark.operators.frequent import heavy_hitters


def test_heavy_hitters_exact_vs_bruteforce_spread_thin(spark):
    """Adversarial shape for the candidate pass: the heavy token is
    spread evenly across many partitions (never locally dominant in
    any obvious way) among a sea of near-unique fillers — the
    pigeonhole guarantee must still surface it, and the recount must
    reproduce brute-force membership and counts exactly."""
    phi_inv = 50
    docs = []
    # 200 docs, 10 filler tokens each (unique per doc) + token "hot"
    # in every 4th doc → freq(hot) = 50, N = 2050, threshold N/50 = 41
    # → hot qualifies; every filler has freq 1
    for i in range(200):
        toks = [f"f{i}_{j}" for j in range(10)]
        if i % 4 == 0:
            toks.append("hot")
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(16)
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df, phi_inv=phi_inv).collect()}

    brute = Counter()
    for _, text in docs:
        brute.update(text.split())
    n = sum(brute.values())
    want = {t: c for t, c in brute.items() if c * phi_inv > n}
    assert got == want == {"hot": 50}


def test_heavy_hitters_boundary_is_strict(spark):
    """cnt * phi_inv > N is strict: a token landing exactly ON the
    threshold is excluded (integer compare, no float fuzz)."""
    # 10 docs x 10 tokens = N=100; "edge" freq 10 → 10*10 == 100 not >
    docs = [
        (i, " ".join([f"u{i}_{j}" for j in range(9)] + ["edge"])) for i in range(10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    assert heavy_hitters(df, phi_inv=10).count() == 0
    # one extra occurrence tips it over
    docs[0] = (0, docs[0][1] + " edge")
    df2 = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df2, phi_inv=10).collect()}
    assert got == {"edge": 11}


@settings(
    max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    corpus=st.lists(
        st.lists(st.integers(0, 20), min_size=1, max_size=12),
        min_size=1,
        max_size=30,
    ),
    phi_inv=st.sampled_from([3, 5, 10]),
)
def test_heavy_hitters_property_matches_counter(spark, corpus, phi_inv):
    """For arbitrary small-vocab corpora (heavy skew by construction)
    the distributed MG + recount output equals a plain Counter's
    strict-threshold heavy set exactly."""
    docs = [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df, phi_inv=phi_inv).collect()}
    brute = Counter(t for _, text in docs for t in text.split())
    n = sum(brute.values())
    assert got == {t: c for t, c in brute.items() if c * phi_inv > n}


def test_containment_catches_quote_jaccard_misses(spark):
    """A short doc quoted inside a long one: containment 1.0, Jaccard
    far below any workable symmetric threshold."""
    short = " ".join(f"q{i}" for i in range(12))
    long = " ".join(f"body{i}" for i in range(80)) + " " + short + " " + " ".join(
        f"tail{i}" for i in range(80)
    )
    df = spark.createDataFrame(
        [(1, long), (2, short)], "doc_id long, text string"
    )
    cont = containment_pairs(df, threshold=0.9).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    assert row["containment"] == 1.0
    assert row["jaccard"] < 0.1  # symmetric rule would never fire
    assert ngram_jaccard_pairs(df, threshold=0.3).count() == 0


@settings(
    max_examples=50, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    stream=st.lists(
        st.tuples(st.integers(0, 15), st.integers(1, 20)), max_size=60
    ),
    phi_inv=st.sampled_from([2, 3, 5]),
    n_chunks=st.sampled_from([1, 3, 7]),
)
def test_mg_merge_compact_property(stream, phi_inv, n_chunks):
    """Weighted merge-compact over arbitrary chunked (token, weight)
    streams: ≤ phi_inv survivors, counter ≤ true ≤ counter + Σdec,
    and any token with true > Σdec survives (the pigeonhole superset
    rule the candidate pass relies on). Pure-Python property — no
    Spark session involved."""
    from collections import Counter

    from flink_assignment_spark.operators.frequent import mg_merge_compact

    true = Counter()
    for t, w in stream:
        true[t] += w
    counters: dict[int, int] = {}
    dec_total = 0
    step = max(1, len(stream) // n_chunks)
    for i in range(0, len(stream), step):
        dec_total += mg_merge_compact(counters, stream[i : i + step], phi_inv)
    assert len(counters) <= phi_inv
    for t, c in counters.items():
        assert c <= true[t] <= c + dec_total, (t, c, true[t], dec_total)
    for t, cnt in true.items():
        if cnt > dec_total:
            assert t in counters, (t, cnt, dec_total)

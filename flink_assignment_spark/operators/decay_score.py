"""Half-life-decayed activity scoring — the recency weighting a
feature store or engagement ranker applies (each event contributes
2^-age_days to its user's score).

EXACT by construction, not approximately-float: events fold to
per-(user, day) counts first, and each term ``count / 2^age`` is a
dyadic rational built with integer shifts — never ``pow()``, whose
rounding the engines need not agree on. With ``count < 2^22`` and
``age ≤ DECAY_KCAP = 30`` every partial sum fits a 53-bit mantissa,
so the total is the SAME double under any fold order, partitioning,
or engine (the mixture-weight exactness trick, applied to time
decay). The cap is also what bounds the streaming twin's state
(streaming/decay_stream.py): days older than ``asof − KCAP`` all
score at 2^-KCAP, so they compact into one sentinel row per user.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECAY_KCAP = 30  # keeps every partial sum exactly representable


def decay_age(day: Column, asof: str) -> Column:
    """Capped whole-day age of ``day`` at ``asof`` (a NULL day is the
    always-capped sentinel the streaming compaction writes). Clamped
    at BOTH ends: an event dated after ``asof`` (or a replayed read
    with an earlier asof) must score at age 0, not feed a negative
    shift count into ``shiftleft`` — Spark/Java wraps a negative count
    mod 64 while DuckDB's ``<<`` does not, which would silently break
    the exact cross-engine dyadic contract this module promises."""
    return F.when(day.isNull(), F.lit(DECAY_KCAP)).otherwise(
        F.greatest(
            F.lit(0),
            F.least(F.datediff(F.lit(asof).cast("date"), day), F.lit(DECAY_KCAP)),
        )
    )

"""Deterministic (hash-based) sampling and split assignment.

Training-data pipelines need *reproducible* sampling: re-running the
job on the same corpus must keep exactly the same rows (so ablations
are comparable and a resumed run doesn't re-draw). ``df.sample()``
is seed-dependent per partition split — its output changes with
partitioning, which a 100 TB job cannot promise. Instead we derive a
uniform u ∈ [0, 1) from a salted md5 of the row key: stable under
repartitioning, shuffles, and speculative re-execution, and cheap
(one hash per row, JVM-side, no exchange at all — sampling is a
narrow map + filter, so it composes with any upstream scan without
adding a stage boundary).

The hash → uniform construction (md5 hex → first 15 hex digits →
60-bit int → /2^60) matches the DuckDB oracle bit-for-bit; see
``functions.text.hash60``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60

TWO_POW_60 = 1 << 60


def uniform_from_key(key: Column, salt: str) -> Column:
    """Deterministic uniform double in [0, 1) from (salt, key)."""
    h = hash60(F.concat(F.lit(salt + ":"), key.cast("string")))
    return h.cast("double") / F.lit(float(TWO_POW_60))


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float], salt: str = "sample"
) -> DataFrame:
    """Keep each row with probability ``rates[stratum]`` (missing
    strata ⇒ dropped), decided by the deterministic uniform — e.g.
    downsample an over-represented language before training."""
    u = uniform_from_key(F.col(key), salt)
    rate = None
    for s, r in rates.items():
        cond = F.when(F.col(stratum) == s, F.lit(r))
        rate = cond if rate is None else rate.when(F.col(stratum) == s, F.lit(r))
    return df.filter(u < rate.otherwise(F.lit(0.0)))


def group_split(group_id: Column) -> Column:
    """q119's GROUP-ATOMIC split routing: md5-derived 60-bit hash of
    the group key (rendered as a string) mod 10 → buckets 0-7 train,
    8 val, 9 test. One definition shared by the batch query and
    ``streaming.split_stream`` so a group's split can never differ
    between a backfill and the live stream; the hash reads only the
    group's canonical member, so assignments are stable as the
    corpus grows."""
    bucket = F.pmod(hash60(group_id.cast("string")), F.lit(10))
    return (
        F.when(bucket <= 7, "train").when(bucket == 8, "val").otherwise("test")
    )


def assign_split(
    df: DataFrame,
    key: str,
    boundaries: list[tuple[str, float]],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add a train/val/test-style label: ``boundaries`` is a list of
    (label, upper_bound) with a final catch-all bound of 1.0, e.g.
    ``[("train", 0.8), ("val", 0.9), ("test", 1.0)]``. Assignment is
    per-key deterministic and independent of the sampling hash (a
    different salt), so sampling then splitting is unbiased."""
    u = uniform_from_key(F.col(key), salt)
    expr = None
    for label, hi in boundaries[:-1]:
        cond = F.when(u < F.lit(hi), F.lit(label))
        expr = cond if expr is None else expr.when(u < F.lit(hi), F.lit(label))
    last_label = boundaries[-1][0]
    expr = expr.otherwise(F.lit(last_label)) if expr is not None else F.lit(last_label)
    return df.withColumn(out_col, expr)


def mixture_rates(
    df: DataFrame, group: str, weights: dict[str, float]
) -> DataFrame:
    """Per-group keep rates that rebalance the corpus to a target
    mixture (LLaMA/Pile-style source mixing) while keeping as much
    data as possible: the feasible total is T = min_g(count_g / w_g)
    — the most under-represented group is kept in full (rate 1.0) and
    every other group is downsampled to ``w_g * T / count_g``.

    Returns one small row per weighted group: ``(group, n, w,
    keep_rate)``. Groups absent from ``weights`` get no row (they are
    dropped from the mixture). A weighted group with ZERO rows in
    ``df`` raises: its n_g/w_g = 0 makes T = 0 (the requested mixture
    is infeasible — every other group would need downsampling to
    nothing), and silently computing rates from only the present
    groups would ship a corpus whose achieved mixture cannot match the
    requested weights. Two narrow aggregations over a
    group-cardinality frame — the 100 TB cost is one count per group;
    the rates frame is broadcast back to the corpus by the caller.
    """
    w_col = None
    for g, w in weights.items():
        cond = F.when(F.col(group) == g, F.lit(float(w)))
        w_col = cond if w_col is None else w_col.when(F.col(group) == g, F.lit(float(w)))
    counts = (
        df.withColumn("w", w_col)
        .filter(F.col("w").isNotNull())
        .groupBy(group, "w")
        .agg(F.count("*").alias("n"))
    ).cache()
    # T is a single number derived from the group-cardinality counts
    # frame — a bounded driver action (like the IVF train-sample
    # count), NOT a per-row collect. Folding it in as a literal keeps
    # the corpus-side plan free of single-row nested-loop cross joins.
    present = {r[0] for r in counts.select(group).collect()}
    missing = set(weights) - present
    if missing:
        raise ValueError(
            f"mixture is infeasible: weighted group(s) {sorted(missing)} have "
            "zero rows (T = min_g(n_g/w_g) = 0)"
        )
    t = counts.agg(F.min(F.col("n").cast("double") / F.col("w"))).collect()[0][0]
    return counts.select(
        group,
        "n",
        "w",
        ((F.col("w") * F.lit(t)) / F.col("n")).alias("keep_rate"),
    )


def mixture_rebalance(
    df: DataFrame,
    key: str,
    group: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Keep a deterministic subset of ``df`` whose ``group`` mixture
    matches ``weights`` (in expectation), discarding as little as
    possible. The rates frame is tiny (one row per group) and
    broadcast — the corpus pass is a narrow filter, no shuffle."""
    rates = mixture_rates(df, group, weights)
    u = uniform_from_key(F.col(key), salt)
    return (
        df.join(F.broadcast(rates.select(group, "keep_rate")), group)
        .filter(u < F.col("keep_rate"))
    )


def temperature_targets(
    df: DataFrame, group: str, budget: int, alpha: float = 0.5
) -> DataFrame:
    """Per-group document targets under TEMPERATURE sampling: target_g
    proportional to n_g^alpha (the multilingual up/down-weighting rule
    from mBERT/XLM-R/mT5 — alpha < 1 flattens the group distribution,
    boosting low-resource groups without letting any single group
    dominate).

    EXACT cross-engine arithmetic: alpha is restricted to {0.5, 1.0}
    because general pow() is not exactly rounded. For alpha = 0.5 the
    weight is floor(sqrt(n_g) * 2^20) — IEEE-754 sqrt IS exactly
    rounded and the power-of-two scale only shifts the exponent, so
    both engines derive the identical BIGINT weight; targets then come
    from pure integer arithmetic: (budget * w_g) div sum(w).

    Returns one small row per group: (group, n, target). One count
    aggregate over the corpus; at 100 TB this frame is group-
    cardinality and broadcast back by the caller.
    """
    if alpha not in (0.5, 1.0):
        raise ValueError(
            "alpha must be 0.5 or 1.0 — general pow() is not exactly "
            "rounded, so other temperatures cannot promise the "
            "cross-engine-exact targets this operator guarantees"
        )
    counts = df.groupBy(group).agg(F.count("*").alias("n"))
    if alpha == 0.5:
        w = F.floor(F.sqrt(F.col("n").cast("double")) * F.lit(1048576.0)).cast("long")
    else:
        w = (F.col("n") * F.lit(1048576)).cast("long")
    weighted = counts.withColumn("w", w)
    # the weight total is one bounded scalar (like mixture_rates' T) —
    # folding it in as a literal keeps the plan free of single-row
    # nested-loop cross joins
    total = weighted.agg(F.sum("w")).collect()[0][0]
    if not total:  # sum over zero rows is NULL; 0 can't divide either
        raise ValueError(
            "temperature sampling over an empty corpus — no groups to "
            "derive targets from (matching kcenter_select's empty-corpus "
            "contract)"
        )
    return weighted.select(
        group,
        "n",
        F.expr(f"({int(budget)} * w) div {int(total)}").alias("target"),
    )


def temperature_sample(
    df: DataFrame,
    key: str,
    group: str,
    budget: int,
    alpha: float = 0.5,
    salt: str = "temperature",
) -> DataFrame:
    """Deterministic temperature-sampled subset: each group keeps its
    ``temperature_targets`` quota, chosen as the target_g rows with the
    smallest salted hash (exact per-group budgets, same rows on every
    re-run — the group-quota analogue of the fixed-budget sample).

    One broadcast join (targets are group-cardinality) + one window
    rank per group partition. Returns ``df``'s rows + ``rnk``.
    """
    targets = temperature_targets(df, group, budget, alpha)
    u = uniform_from_key(F.col(key), salt)
    w = Window.partitionBy(group).orderBy(u.asc(), F.col(key).asc())
    return (
        df.join(F.broadcast(targets.select(group, "target")), group)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.col("target"))
        .drop("target")
    )

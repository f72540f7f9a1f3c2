"""k-anonymity / l-diversity auditing and suppression.

The group-privacy layer a curation pipeline runs on PEOPLE-shaped
tables before release (Sweeney 2002, "k-Anonymity: a model for
protecting privacy"; Machanavajjhala et al. 2007 for l-diversity) —
the complement of the record-level paths already here: PII redaction
(operators/pii.py) scrubs identifiers INSIDE text, erasure
(operators/erasure.py) deletes a named subject, and this guards
against RE-identification of everyone else: a quasi-identifier
combination shared by fewer than k records singles its members out
even with direct identifiers removed, and a group whose sensitive
attribute takes fewer than l distinct values leaks it to anyone who
can place a subject in the group.

Spark shape: one hash-partitioned groupBy over the quasi-identifier
columns computes group size and sensitive-value diversity
(``count``/``countDistinct`` — partial aggregation map-side, a single
shuffle), then suppression is a broadcast semi-join of the failing
(small by definition: only rare combinations fail) group keys back
onto the records. Nothing is quadratic; at 100 TB the audit is one
aggregate pass and the suppression join's build side is the failing
groups only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _null_safe_anti_semi(df: DataFrame, keys: DataFrame, on: list[str], how: str) -> DataFrame:
    """left_anti / left_semi of ``df`` against ``keys`` with per-column
    NULL-SAFE equality (groupBy treats NULL as a value; a plain
    column-list join would never match NULL keys)."""
    rec = df.alias("_rec")
    key = keys.alias("_key")
    cond = None
    for c in on:
        eq = F.col(f"_rec.{c}").eqNullSafe(F.col(f"_key.{c}"))
        cond = eq if cond is None else (cond & eq)
    return rec.join(F.broadcast(key), cond, how)


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive: Column | None = None,
    l_div: int | None = None,
) -> DataFrame:
    """Per quasi-identifier group: size ``n``, sensitive-value
    diversity ``n_sensitive`` (when ``sensitive`` is given), and the
    pass/fail verdicts ``k_ok`` (n >= k) and ``l_ok`` (n_sensitive >=
    l_div). A released table is k-anonymous iff every row has
    ``k_ok``; l-diverse iff every row also has ``l_ok``."""
    aggs = [F.count("*").alias("n")]
    if sensitive is not None:
        aggs.append(F.countDistinct(sensitive).alias("n_sensitive"))
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn("k_ok", F.col("n") >= F.lit(k))
    if sensitive is not None and l_div is not None:
        out = out.withColumn("l_ok", F.col("n_sensitive") >= F.lit(l_div))
    return out


def k_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """Drop every record whose quasi-identifier group has fewer than
    ``k`` members — suppression, the release-safe default when
    generalization hierarchies aren't available. The failing-group key
    set is small by construction (only rare combinations fail), so
    the filter is a broadcast anti-join, not a second full shuffle of
    the records. The join is NULL-SAFE per column (eqNullSafe — still
    an equi-join key Spark hash-joins on): groupBy treats NULL as a
    group, so a plain column-list anti-join would never match a
    failing group containing a NULL quasi value and those records
    would leak through unsuppressed (r16, found by the streaming-gate
    NULL parity test)."""
    failing = (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") < k)
        .select(*quasi_cols)
    )
    return _null_safe_anti_semi(df, failing, quasi_cols, "left_anti")


def l_suppress(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: Column,
    l_div: int,
) -> DataFrame:
    """Drop every record whose quasi-identifier group has fewer than
    ``l_div`` DISTINCT sensitive values (Machanavajjhala et al. 2007:
    a k-anonymous group whose sensitive attribute is near-constant
    still leaks it — the homogeneity attack k-anonymity alone misses).
    Same shape as :func:`k_suppress`: one aggregate, then a NULL-safe
    broadcast anti-join on the (small) failing-group keys."""
    failing = (
        df.groupBy(*quasi_cols)
        .agg(F.countDistinct(sensitive).alias("_nd"))
        .filter(F.col("_nd") < l_div)
        .select(*quasi_cols)
    )
    return _null_safe_anti_semi(df, failing, quasi_cols, "left_anti")


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive: Column,
    t_frac: tuple[int, int] = (1, 5),
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) for
    an ORDERED sensitive attribute: per quasi-identifier group, the
    Earth Mover's Distance between the group's sensitive-value
    distribution and the whole table's, under ordered distance —
    EMD = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)| over the m global
    domain values. The third rung of the group-privacy ladder:
    k-anonymity bounds group SIZE, l-diversity bounds VARIETY, and
    t-closeness bounds how much the group's distribution itself
    leaks against the published global one.

    Exact integer arithmetic end-to-end (the engine's float folds
    never touch the verdict): with group counts c_gj, global counts
    c_j, group size n_g, total N, the EMD numerator is
    Σ_i |Σ_{j≤i} (c_gj·N − c_j·n_g)| over the global value order and
    the denominator is n_g·N·(m−1); the pass verdict compares the
    fraction against ``t_frac = (num, den)`` by cross-multiplication
    (default 1/5 = 0.2). Callers pass a BANDED sensitive column (m
    small) — the generalized domain t-closeness is defined over in
    practice, and what keeps the group×domain grid at
    |groups| × m rows.

    Scale shape: two aggregates over the records; the m-row global
    distribution (with N and m attached by an unpartitioned window
    over m rows) broadcasts onto the groups through a constant-key
    BROADCAST HASH join — an equi join, not a nested loop — and the
    per-group cumulative sums window over exactly m rows each.

    Output per group: quasi cols, ``n``, ``emd_num``, ``emd_den``,
    ``t_emd`` (rounded double for reading), ``t_ok``. Records whose
    sensitive value is NULL are EXCLUDED from both distributions —
    EMD over an ordered domain has no defined position for NULL, and
    the engines even disagree on where a NULL sorts (Spark windows
    order NULLS FIRST, DuckDB NULLS LAST), so including it would make
    the audit engine-dependent. NULL quasi values are fine (NULL is a
    group, matched null-safely throughout)."""
    base = df.select(*quasi_cols, sensitive.alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    gv = base.groupBy("_v").agg(F.count("*").cast("long").alias("_c_v"))
    w_all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # the constant broadcast key must be DATA-DEPENDENT (n − n, not
    # lit(1)): Catalyst constant-folds a literal join key into a
    # trivially-true condition and plans a BroadcastNestedLoopJoin —
    # the derived zero keeps it a BroadcastHashJoin
    gv = gv.select(
        "_v",
        "_c_v",
        F.sum("_c_v").over(w_all).cast("long").alias("_N"),
        F.count("*").over(w_all).cast("long").alias("_m"),
        (F.col("_c_v") - F.col("_c_v")).cast("long").alias("_one"),
    )
    groups = base.groupBy(*quasi_cols).agg(
        F.count("*").cast("long").alias("n")
    ).withColumn("_one", (F.col("n") - F.col("n")).cast("long"))
    counts = base.groupBy(*quasi_cols, "_v").agg(
        F.count("*").cast("long").alias("_c_gv")
    )
    grid = groups.join(F.broadcast(gv), "_one").drop("_one").alias("_grid")
    # NULL-SAFE per quasi column (groupBy keeps NULL as a group; a
    # plain column-list join would never match a NULL-keyed group's
    # own counts, zeroing its whole distribution — r16 review). _v is
    # non-null here (NULL sensitive values are excluded above).
    cnt = counts.alias("_cnt")
    cond = F.col("_grid._v") == F.col("_cnt._v")
    for c in quasi_cols:
        cond = cond & F.col(f"_grid.{c}").eqNullSafe(F.col(f"_cnt.{c}"))
    grid = grid.join(cnt, cond, "left").select(
        *[F.col(f"_grid.{c}") for c in quasi_cols],
        F.col("_grid._v").alias("_v"),
        "_c_v",
        "_N",
        "_m",
        "n",
        F.coalesce(F.col("_cnt._c_gv"), F.lit(0)).cast("long").alias("_c_gv"),
    )
    w = Window.partitionBy(*quasi_cols).orderBy("_v")
    cum = grid.withColumn(
        "_cs",
        F.sum(F.col("_c_gv") * F.col("_N") - F.col("_c_v") * F.col("n")).over(w),
    )
    tn, td = t_frac
    out = cum.groupBy(*quasi_cols).agg(
        F.first("n").alias("n"),
        # Σ|cs| over ALL m values: the m-th cumulative term is 0 by
        # construction (both distributions sum to 1), so the i<m sum
        # and the full sum coincide
        F.sum(F.abs(F.col("_cs"))).cast("long").alias("emd_num"),
        (F.first("n") * F.first("_N") * (F.first("_m") - 1))
        .cast("long")
        .alias("emd_den"),
    )
    return out.select(
        *quasi_cols,
        "n",
        "emd_num",
        "emd_den",
        F.round(F.col("emd_num") / F.col("emd_den"), 6).alias("t_emd"),
        (F.col("emd_num") * F.lit(td) <= F.col("emd_den") * F.lit(tn))
        .cast("int")
        .alias("t_ok"),
    )


def k_generalize(
    df: DataFrame,
    quasi_cols: list[str],
    levels: list[dict[str, Column]],
    k: int,
) -> DataFrame:
    """Generalize-then-release: the non-lossy k-anonymization real
    release pipelines try BEFORE suppression (Sweeney 2002 §5 —
    generalization walks a value hierarchy; suppression biases the
    corpus by dropping exactly the rare combinations).

    ``levels[i]`` maps quasi column → its level-``i`` generalization
    expression (columns absent from a level's dict stay at their
    original value; ``levels[0]`` is normally ``{}`` = the exact
    values). Each record is released at the FIRST level at which its
    progressively-generalized group — among the records not yet
    released at a finer level — reaches ``k`` members; records whose
    group never reaches ``k`` at the coarsest level are the suppressed
    residue and are excluded. Output: the input columns plus
    ``gen_level`` (int, the release level). The released table is
    k-anonymous on (gen_level, generalized quasi tuple) by
    construction: a level's released groups each hold ≥ k records and
    levels are disjoint record sets.

    Scale shape: one aggregate per level over the REMAINING records
    (shrinking fast — most of the corpus releases at level 0), each
    followed by a broadcast anti/semi join on the failing-group keys,
    which are small by definition (only under-k combinations fail).
    ``len(levels)`` is a small constant (a hierarchy has 3–5 rungs),
    so the loop is a fixed plan, not data-dependent iteration."""
    remaining = df
    released: DataFrame | None = None
    gcols = [f"_g_{c}" for c in quasi_cols]
    for lvl, overrides in enumerate(levels):
        unknown = set(overrides) - set(quasi_cols)
        if unknown:
            raise ValueError(f"level {lvl} generalizes non-quasi columns {sorted(unknown)}")
        # materialize each level's tagged frame (failing, the release,
        # and the next level's remainder all read it; without this,
        # level L's lineage re-runs every earlier level's joins — the
        # plan audit showed 14 base scans for 3 levels). localCheckpoint,
        # not persist: a cached frame has no unpersist handle after
        # return and would pin len(levels) full-width copies in the
        # CacheManager per call forever (r16 review); checkpointed RDDs
        # are reclaimed by GC with the returned DataFrame.
        tagged = remaining.select(
            "*",
            *[
                overrides.get(c, F.col(c)).alias(g)
                for c, g in zip(quasi_cols, gcols)
            ],
        ).localCheckpoint()
        failing = (
            tagged.groupBy(*gcols)
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") < k)
            .select(*gcols)
        )
        rel = (
            _null_safe_anti_semi(tagged, failing, gcols, "left_anti")
            .drop(*gcols)
            .withColumn("gen_level", F.lit(lvl))
        )
        released = rel if released is None else released.unionByName(rel)
        remaining = _null_safe_anti_semi(tagged, failing, gcols, "left_semi").drop(
            *gcols
        )
    assert released is not None  # levels must be non-empty
    return released

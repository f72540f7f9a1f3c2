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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
        .alias("_failing")
    )
    rec = df.alias("_rec")
    cond = None
    for c in quasi_cols:
        eq = F.col(f"_rec.{c}").eqNullSafe(F.col(f"_failing.{c}"))
        cond = eq if cond is None else (cond & eq)
    return rec.join(F.broadcast(failing), cond, "left_anti")

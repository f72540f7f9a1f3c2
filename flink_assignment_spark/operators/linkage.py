"""Record linkage / fuzzy entity matching.

Candidate generation uses the FastSS deletion-neighborhood trick
(Bocek et al. 2007, "Fast Similarity Search in Large Dictionaries";
popularized by SymSpell): for edit distance <= 1, two strings match
iff their variant sets D(s) = {s} ∪ {s with one char deleted}
intersect — so candidates come from ONE equi-join on a derived
variant key instead of an N² cross join with a per-pair edit-distance
UDF. Verification is the built-in ``F.levenshtein`` (JVM-side,
whole-stage codegen), run only on the candidate pairs.

100 TB shape: the variant explosion is a narrow map emitting
(len(s) + 1) rows per record; the join key (variant string) is
well-distributed for identifier-like data (each bucket holds only the
records one edit apart), and the verify is a post-join scalar filter.
Nothing is quadratic in table size — worst-case fan-out is bounded by
the largest variant bucket, the same posting-list consideration
handled for shingles via ``cap_doc_freq``; a df-style cap can be
composed in front for adversarial key distributions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column) -> Column:
    """FastSS distance-1 variant set of a string column: the string
    itself plus every single-character deletion, duplicates removed
    (adjacent equal characters delete to the same variant)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(s) + 1),
            lambda i: F.concat(
                s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))
            ),
        )
    )


def fuzzy_pairs_lev1(
    df: DataFrame, id_col: str, name_col: str
) -> DataFrame:
    """All record pairs whose ``name_col`` values are within
    Levenshtein distance 1, as (id_a, id_b, dist) with id_a < id_b.

    Deletion-neighborhood candidate join (lossless for distance <= 1:
    a substitution at position i means both strings delete position i
    to the same variant; an insert/delete means the shorter string IS
    a variant of the longer) → distinct pairs (two strings can share
    several variants) → exact ``levenshtein`` verify. The exploded
    variant frame is cached because the self-join reads it twice and
    Spark performs no common-subexpression elimination across
    self-join sides (at cluster scale: persist the variant index).
    """
    # two projections, not one: aliasing to "name" and exploding
    # deletion_variants(name_col) in the SAME select makes Spark
    # resolve the variant expression as a lateral column alias when
    # the input column is itself called "name" (internal-error bug)
    v = (
        df.select(F.col(id_col).alias("rid"), F.col(name_col).alias("name"))
        .select(
            "rid",
            "name",
            F.explode_outer(deletion_variants(F.col("name"))).alias("var"),
        )
        .filter(F.col("var").isNotNull())
        .cache()
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.var") == F.col("b.var"))
            & (F.col("a.rid") < F.col("b.rid")),
        )
        .select(
            F.col("a.rid").alias("id_a"),
            F.col("b.rid").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .distinct()
    )
    return cand.filter(F.levenshtein("name_a", "name_b") <= 1).select(
        "id_a",
        "id_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
    )

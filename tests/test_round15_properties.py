"""Property tests for the round-15 operators: k-anonymity suppression,
FFD sequence packing, and the corpus-integrity manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_assignment_spark.operators.packing import (
    bin_shard,
    pack_sequences,
    packing_stats,
)
from flink_assignment_spark.operators.privacy import k_anonymity_audit, k_suppress
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR

BUDGET = 64


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


# ------------------------------------------------------- k-anonymity
def test_k_suppress_yields_k_anonymous_table(spark):
    cust = load_table(spark, SF_DIR, "customer").withColumn(
        "acct_band", F.floor(F.col("c_acctbal") / 2000).cast("int")
    )
    quasi = ["c_nationkey", "c_mktsegment", "acct_band"]
    k = 5
    released = k_suppress(cust, quasi, k)
    audit = k_anonymity_audit(released, quasi, k)
    assert audit.filter(~F.col("k_ok")).count() == 0
    # suppression drops EXACTLY the failing groups' members
    failing = k_anonymity_audit(cust, quasi, k).filter(~F.col("k_ok"))
    n_failing = failing.agg(F.sum("n")).collect()[0][0] or 0
    assert released.count() == cust.count() - n_failing
    assert failing.count() > 0  # the fixture actually exercises it


def test_k_anonymity_audit_verdicts(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "a", 20), (4, "b", 30)],
        "rid long, g string, sens long",
    )
    got = {
        r.g: (r.n, r.n_sensitive, r.k_ok, r.l_ok)
        for r in k_anonymity_audit(
            df, ["g"], k=2, sensitive=F.col("sens"), l_div=2
        ).collect()
    }
    assert got == {"a": (3, 2, True, True), "b": (1, 1, False, False)}


# --------------------------------------------------- sequence packing
def test_packing_respects_budget_and_conserves_docs(spark):
    docs = _docs(spark)
    got = pack_sequences(docs, BUDGET).cache()
    stats = packing_stats(got, BUDGET)
    # ceiling: every non-overflow bin fits the budget
    assert stats.filter((F.col("overflow") == 0) & (F.col("n_tokens") > BUDGET)).count() == 0
    # overflow bins are singletons and really are oversized docs
    over = stats.filter(F.col("overflow") == 1)
    assert over.filter(F.col("n_docs") != 1).count() == 0
    assert over.filter(F.col("n_tokens") <= BUDGET).count() == 0
    # conservation: every doc assigned exactly once, token sums intact
    assert got.count() == docs.count()
    assert got.select("doc_id").distinct().count() == docs.count()
    got.unpersist()


def test_packing_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = sorted(
        (r.doc_id, r.n_tokens, r.bin_id, r.overflow)
        for r in pack_sequences(docs, BUDGET).collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, r.bin_id, r.overflow)
        for r in pack_sequences(docs.repartition(17), BUDGET).collect()
    )
    assert a == b


def test_packing_first_fit_efficiency_property(spark):
    """First-fit invariant: per shard, at most ONE bin is ≤ half full
    (two such bins would have been merged by first-fit) — the bound
    behind the module's efficiency-floor formula."""
    docs = _docs(spark)
    stats = packing_stats(pack_sequences(docs, BUDGET), BUDGET).filter(
        F.col("overflow") == 0
    )
    half_empty_per_shard = (
        stats.withColumn("shard", bin_shard(F.col("bin_id")).cast("int"))
        .filter(F.col("n_tokens") * 2 <= BUDGET)
        .groupBy("shard")
        .count()
    )
    assert half_empty_per_shard.filter(F.col("count") > 1).count() == 0


def test_packing_with_external_token_counts(spark):
    """Packing under a caller-supplied count column (the real-
    tokenizer path) uses those counts verbatim."""
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 10), (4, 200)], "doc_id long, toks long"
    )
    got = {
        r.doc_id: (r.n_tokens, r.overflow)
        for r in pack_sequences(
            df, 64, n_tokens_col="toks", n_shards=1
        ).collect()
    }
    assert got[4] == (200, True)
    assert got[1][0] == 60 and not got[1][1]
    # 60+10 <= 64 is false, 60 alone fits: three non-overflow bins? no —
    # FFD order 60,60,10: bins [60],[60],[10->fits first? cap=4 no,
    # second? cap=4 no -> new bin]. Exactly: doc3 opens its own bin.
    stats = packing_stats(
        pack_sequences(df, 64, n_tokens_col="toks", n_shards=1), 64
    )
    assert stats.filter(F.col("overflow") == 0).count() == 3


# ------------------------------------------------------ corpus manifest
def test_manifest_localizes_single_row_changes(spark):
    from flink_assignment_spark.operators.manifest import (
        corpus_manifest,
        manifest_diff,
    )

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    cols = ["doc_id", "text", "lang", "source"]
    m0 = corpus_manifest(docs, "doc_id", cols)
    # identical copy, different partitioning: zero diff (order/layout
    # independence is the whole point)
    m1 = corpus_manifest(docs.repartition(23), "doc_id", cols)
    assert manifest_diff(m0, m1).count() == 0
    # one mutated row: exactly ONE bucket flagged, same n_rows
    vid = docs.select(F.min("doc_id")).collect()[0][0]
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == vid, F.concat(F.col("text"), F.lit("!")))
        .otherwise(F.col("text")),
    )
    d = manifest_diff(m0, corpus_manifest(mutated, "doc_id", cols)).collect()
    assert len(d) == 1 and d[0].n_rows_a == d[0].n_rows_b
    # one dropped row: exactly one bucket flagged, count off by one
    d2 = manifest_diff(
        m0, corpus_manifest(docs.filter(F.col("doc_id") != vid), "doc_id", cols)
    ).collect()
    assert len(d2) == 1 and d2[0].n_rows_a == d2[0].n_rows_b + 1


def test_manifest_proves_erasure_cascade(spark):
    """Composition: the manifest localizes an erasure to exactly the
    erased subjects' buckets — the audit a right-to-be-forgotten
    rewrite ships with its report."""
    from flink_assignment_spark.operators.manifest import (
        corpus_manifest,
        manifest_diff,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    erase = {0, 7}
    after = docs.filter(~F.col("doc_id").isin(list(erase)))
    d = manifest_diff(
        corpus_manifest(docs, "doc_id", ["doc_id", "text"]),
        corpus_manifest(after, "doc_id", ["doc_id", "text"]),
    )
    flagged = {r.bucket for r in d.collect()}
    from flink_assignment_spark.functions.text import hash60

    # mirror _key_bucket's NULL-safe key encoding (r16: '\x01'+key /
    # '\x00' sentinel) rather than the pre-r16 raw-key concat
    enc = F.coalesce(
        F.concat(F.lit("\x01"), F.col("doc_id").cast("string")), F.lit("\x00")
    )
    want = {
        r.b
        for r in docs.filter(F.col("doc_id").isin(list(erase)))
        .select(
            F.pmod(
                hash60(F.concat(F.lit("manifest:"), enc)),
                F.lit(64),
            ).cast("int").alias("b")
        )
        .collect()
    }
    assert flagged == want

"""Distributed BPE merge training: exact equality with a pure-Python
reference trainer, greedy non-overlapping rule application, and
determinism."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_assignment_spark.operators.bpe import (
    _merge_rule,
    bpe_merges_df,
    bpe_train_merges,
)
from flink_assignment_spark.sources.loaders import load_table

from .conftest import SF_DIR


def _py_bpe(texts, n_merges):
    seqs = [list(t.lower()) for t in texts]
    out = []
    for rank in range(1, n_merges + 1):
        counts = Counter()
        for s in seqs:
            for x, y in zip(s, s[1:]):
                counts[(x, y)] += 1
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        out.append((rank, l, r, cnt))
        merged = l + r
        new_seqs = []
        for s in seqs:
            acc = []
            for x in s:
                if acc and acc[-1] == l and x == r:
                    acc[-1] = merged
                else:
                    acc.append(x)
            new_seqs.append(acc)
        seqs = new_seqs
    return out


def test_merge_rule_greedy_nonoverlapping(spark):
    df = spark.createDataFrame([Row(tk=["a", "a", "a", "b", "a", "a"])])
    (got,) = df.select(_merge_rule(F.col("tk"), "a", "a").alias("m")).collect()
    assert got.m == ["aa", "a", "b", "aa"]


def test_merge_rule_merged_symbol_chains_left(spark):
    # after [a,b] -> ab, a following b must NOT merge with the new
    # symbol under the same rule (its left side is "ab", not "a")
    df = spark.createDataFrame([Row(tk=["a", "b", "b", "a", "b"])])
    (got,) = df.select(_merge_rule(F.col("tk"), "a", "b").alias("m")).collect()
    assert got.m == ["ab", "b", "ab"]


def test_bpe_matches_python_reference(spark):
    docs = load_table(spark, SF_DIR, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    want = _py_bpe(texts, 6)
    got = bpe_train_merges(docs, 6)
    assert got == want
    assert len(got) == 6  # this corpus supports at least 6 merges
    # merged symbols grow: later rules may consume earlier merges
    assert all(len(l) + len(r) >= 2 for _, l, r, _ in got)


def test_bpe_merges_df_shape_and_determinism(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    a = [tuple(r) for r in bpe_merges_df(docs, 4).orderBy("rank").collect()]
    b = [tuple(r) for r in bpe_merges_df(docs, 4).orderBy("rank").collect()]
    assert a == b
    assert [r[0] for r in a] == list(range(1, len(a) + 1))
    counts = [r[3] for r in a]
    # pair counts need not be monotone (a merge can CREATE a popular
    # pair), but every promoted rule occurred at least twice
    assert all(c >= 2 for c in counts)

"""Distributed BPE merge training (Sennrich et al. 2016) — the
tokenizer-TRAINING half next to the registry's tokenizer-APPLICATION
statistics (q57 subword counts, q114 vocab coverage, q120 fertility).

Byte-pair encoding is inherently iterative: each round counts
adjacent symbol pairs corpus-wide, promotes the most frequent pair to
a new merged symbol, and rewrites every sequence under the new rule.
The distributed shape per round:

- PAIR COUNT — one explode + groupBy over the symbol arrays
  (map-side partial counts; the q53 bigram shape), then a bounded
  top-1 driver action (count desc, pair asc — a total order, so the
  winning rule is engine- and partitioning-independent).
- REWRITE — a narrow per-row pass applying the one new rule
  (greedy LEFTMOST non-overlapping — one linear literal string
  replace, see :func:`_merge_rule`), no shuffle, no Python. The k
  rounds each persist their rewritten frame and release the
  predecessor, so lineage stays flat (the k-center loop's
  discipline).

k full corpus passes is the honest cost of exact BPE — production
trainers batch candidate rules or sample; both compose with this
kernel. Unlike frequency-table-only approximations, rewriting the
corpus keeps the counts EXACT after every merge (overlaps like "aaa"
under rule (a,a) count the greedy non-overlapping occurrences, not
the naive sliding-window count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_SEP = "\x1e"  # symbol delimiter; stripped from input text at init


def _merge_rule(tk: Column, left: str, right: str) -> Column:
    """Apply one merge rule to a symbol array: greedy leftmost
    non-overlapping replacement of (left, right) by left||right —
    after a merge the NEW symbol is what precedes the next element,
    so "aaa" under (a,a) becomes [aa, a], exactly the BPE application
    rule.

    Implemented as ONE literal string replace over the join in which
    EVERY symbol carries its own enclosing delimiters
    (SEP s1 SEP SEP s2 SEP ...): the pattern SEP+l+SEP+SEP+r+SEP can
    only match symbols that END at a boundary — a single-delimiter
    join let the right side match as a PREFIX of a longer symbol
    (rule (e, ' ') merged into a neighboring ' s'), and adjacent pair
    occurrences keep their own boundaries, so left-to-right
    non-overlapping ``replace`` with continuation after each
    substitution is exactly the fold semantics. The first
    implementation was an ``aggregate`` HOF fold, which copies the
    accumulator array per element — O(len²) per row, 90 s per 6-merge
    training run at sf0.1 vs ~3 s for this linear form. Symbols must
    not contain SEP (the trainer strips it from input)."""
    s = F.concat(F.lit(_SEP), F.concat_ws(_SEP + _SEP, tk), F.lit(_SEP))
    s2 = F.replace(
        s,
        F.lit(_SEP + left + _SEP + _SEP + right + _SEP),
        F.lit(_SEP + left + right + _SEP),
    )
    core = F.substring(s2, F.lit(2), F.length(s2) - 2)
    return F.when(F.size(tk) == 0, tk).otherwise(F.split(core, _SEP + _SEP))


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    word_level: bool = False,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` character-level BPE merge rules from the
    corpus; returns [(rank, left, right, pair_count)] in merge order.
    Deterministic: the winning pair each round is the (count desc,
    left asc, right asc) maximum. Stops early when no adjacent pair
    occurs twice.

    ``word_level=True`` is the Sennrich 2016 WORD-INTERNAL form — the
    100 TB training path: pre-tokenize on whitespace, fold the corpus
    into the distinct ``(word, count)`` frequency table in ONE corpus
    pass, then run every merge round over that VOCAB-SIZED table with
    frequency-weighted pair counts. Per-merge cost is flat in corpus
    size (vocab grows sublinearly); merges never span a word boundary
    and whitespace never becomes a symbol. The byte-level default
    rewrites the full corpus each round — exact for cross-word
    semantics and the honest cost of them; on a corpus whose winning
    pairs are all word-internal the two trainers learn identical
    rules (pinned in tests/test_bpe.py)."""
    if word_level:
        return _bpe_train_word_level(docs, n_merges, text_col, lowercase)
    from pyspark import StorageLevel

    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    # State lives in the DELIMITED-STRING form between rounds (r17) —
    # the same fixed-point representation bpe_apply chains its rules
    # over: SEP s1 SEP SEP s2 SEP ... Per round that makes the rewrite
    # ONE literal replace (no concat_ws back from an array) and the
    # cached frame ONE string per doc instead of an array of 1-char
    # strings (UnsafeArrayData overhead per element made the old char-
    # array cache ~10x the text bytes; a 3x-text string persists and
    # scans far cheaper). Pair counting splits the string back per
    # round — the same split the old rewrite already paid — via an
    # intermediate projection whose alias is used 4x (CollapseProject
    # keeps non-cheap multi-referenced aliases in their own Project,
    # so the split runs once per row). Counts and rewrites are
    # value-identical to the array form by construction: the string is
    # a bijective encoding of the symbol sequence (symbols cannot
    # contain SEP — stripped at init).
    base = F.split(F.translate(txt, _SEP, ""), "")
    s0 = F.concat(F.lit(_SEP), F.concat_ws(_SEP + _SEP, base), F.lit(_SEP))
    # deliberately NOT spread(): the sampled local corpus arrives as
    # one scan split and the per-round map (pair explode + partial
    # agg) runs single-task — but fanning the cached state to 32
    # partitions was MEASURED SLOWER (q135 A/B med-ratio 1.26,
    # plans/r17/evidence/ab_q135_spread.json): at this state size the
    # 32-task scheduling floor costs more per round than the work.
    # At 100 TB the corpus arrives in many splits, so spread would be
    # inert there anyway — it has no scale upside to buy.
    state = docs.select(s0.alias("s")).persist(StorageLevel.MEMORY_AND_DISK)
    # ONE corpus pass per round (guide §1.2 — remove whole passes
    # first): the round's top-pair aggregate is the action that
    # materializes the PREVIOUS round's rewrite into the cache (the
    # rewrite itself is a narrow string replace fused into the same
    # job), replacing the old eager nxt.count() pass; the predecessor
    # stays persisted until the fold has run so the rewrite reads the
    # cache, not the full lineage. The final round's rewrite is never
    # consumed (only the merge list leaves this function), so it is
    # not built at all — k rounds cost k passes, down from 2k+... .
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = _top_pair(state.select(_split_syms("s").alias("tk")))
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0].cnt < 2:
                break
            left, right, cnt = top[0].l, top[0].r, int(top[0].cnt)
            merges.append((rank, left, right, cnt))
            if rank < n_merges:
                nxt = state.select(_replace_rule("s", left, right).alias("s")).persist(
                    StorageLevel.MEMORY_AND_DISK
                )
                prev, state = state, nxt
    finally:
        state.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def _split_syms(s: str) -> Column:
    """Delimited string -> symbol array: strip the enclosing single
    delimiters, split on the double delimiter. The exact inverse of
    the encoding built at trainer init / maintained by
    :func:`_replace_rule` (an empty symbol sequence round-trips as
    [""] — zero adjacent pairs, exactly like the array form)."""
    inner = F.substring(F.col(s), F.lit(2), F.length(s) - 2)
    return F.split(inner, _SEP + _SEP)


def _replace_rule(s: str, left: str, right: str) -> Column:
    """One merge rule applied to the delimited-string state — the
    string half of :func:`_merge_rule` (same pattern, same greedy
    leftmost non-overlapping ``replace`` semantics), staying in string
    form."""
    return F.replace(
        F.col(s),
        F.lit(_SEP + left + _SEP + _SEP + right + _SEP),
        F.lit(_SEP + left + right + _SEP),
    )


def _top_pair(state: DataFrame, weight: str | None = None):
    """The round's winning adjacent pair over a (tk[, weight]) frame:
    count (or weight-sum) every adjacent symbol pair, return the
    (count desc, left asc, right asc) maximum — a bounded 1-row
    driver action. Shared by both trainers."""
    tk = F.col("tk")
    pairs = F.transform(
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
        lambda x, i: F.struct(x.alias("l"), F.element_at(tk, i + 2).alias("r")),
    )
    cols = [F.explode_outer(pairs).alias("p")] + ([F.col(weight)] if weight else [])
    agg = F.count("*") if weight is None else F.sum(weight)
    return (
        state.select(*cols)
        .filter(F.col("p").isNotNull())
        .groupBy("p.l", "p.r")
        .agg(agg.alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(1)
        .collect()
    )


def _bpe_train_word_level(
    docs: DataFrame,
    n_merges: int,
    text_col: str,
    lowercase: bool,
) -> list[tuple[int, str, str, int]]:
    """The word-frequency trainer behind
    ``bpe_train_merges(word_level=True)``: one corpus pass builds the
    distinct-(word, n) table, then each round explodes the VOCAB's
    adjacent pairs weighted by word frequency (sum(n), not count(*)),
    promotes the (count desc, left asc, right asc) maximum, and
    rewrites the vocab with the same greedy-leftmost
    :func:`_merge_rule` string kernel the byte-level trainer uses —
    so per-word application semantics (overlap handling, merged-symbol
    chaining) are identical by construction."""
    from pyspark import StorageLevel

    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    clean = F.translate(txt, _SEP, "")
    # the ONE corpus-sized pass: whitespace pre-tokenize + frequency
    # fold (map-side partial counts; at 100 TB this is the same shape
    # as any word-count)
    words = (
        docs.select(F.explode(F.split(clean, r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("n"))
    )
    # same delimited-STRING state as the byte-level trainer (r17): one
    # replace per round, vocab cached as strings instead of char arrays
    s0 = F.concat(
        F.lit(_SEP), F.concat_ws(_SEP + _SEP, F.split(F.col("w"), "")), F.lit(_SEP)
    )
    state = words.select(s0.alias("s"), "n").persist(StorageLevel.MEMORY_AND_DISK)
    # same one-pass-per-round discipline as the byte-level loop above:
    # the top-pair fold materializes the previous rewrite, and the
    # never-consumed final rewrite is skipped
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = _top_pair(
                state.select(_split_syms("s").alias("tk"), "n"), weight="n"
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top or top[0].cnt < 2:
                break
            left, right, cnt = top[0].l, top[0].r, int(top[0].cnt)
            merges.append((rank, left, right, cnt))
            if rank < n_merges:
                nxt = state.select(
                    _replace_rule("s", left, right).alias("s"), "n"
                ).persist(StorageLevel.MEMORY_AND_DISK)
                prev, state = state, nxt
    finally:
        state.unpersist()
        if prev is not None:
            prev.unpersist()
    return merges


def bpe_merges_df(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    lowercase: bool = True,
    word_level: bool = False,
) -> DataFrame:
    """:func:`bpe_train_merges` as a DataFrame —
    (rank, left, right, pair_count), the frozen merge-table artifact
    a tokenizer ships (the train-once/apply-always split the BM25 /
    IVF / quality-cutoff exports follow)."""
    merges = bpe_train_merges(docs, n_merges, text_col, lowercase, word_level)
    return docs.sparkSession.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def bpe_apply(
    merges: list[tuple[int, str, str, int]] | DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
) -> Column:
    """Tokenize ``text_col`` under a FROZEN merge table — the APPLY
    half of the train/apply split (BM25's frozen-stats scorer, IVF's
    frozen centroids): rules apply in rank order, each as the same
    greedy leftmost non-overlapping pass the trainer used, so applying
    the learned rules to the training corpus reproduces the trainer's
    final symbol state exactly. Returns the symbol-array COLUMN
    (compose with size()/explode as needed); linear per rule — k
    literal replaces, no Python, deployable unchanged on a stream."""
    if isinstance(merges, DataFrame):
        merges = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in merges.collect()
        ]
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    clean = F.translate(txt, _SEP, "")
    # stay in the delimited STRING form across ALL rules and split
    # once at the end: chaining _merge_rule's array->string->array
    # layers duplicates each layer's subtree ~4x (no common-
    # subexpression elimination at analysis), so k rules cost ~4^k
    # expression copies — measured 4.2 s vs 0.6 s for the k=6 apply
    # at sf0.1. The string is a fixed point of the representation, so
    # one wrap + k replaces + one unwrap is semantically identical.
    s = F.concat(
        F.lit(_SEP), F.concat_ws(_SEP + _SEP, F.split(clean, "")), F.lit(_SEP)
    )
    for _, left, right, _ in sorted(merges, key=lambda m: m[0]):
        s = F.replace(
            s,
            F.lit(_SEP + left + _SEP + _SEP + right + _SEP),
            F.lit(_SEP + left + right + _SEP),
        )
    core = F.substring(s, F.lit(2), F.length(s) - 2)
    return F.when(
        F.length(clean) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(core, _SEP + _SEP))

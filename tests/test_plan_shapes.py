"""Physical-plan regression tests: lock in the plan shapes the engine
is designed around (pushdown, pruning, broadcast of constant-size dims,
top-k without full sort). A query can silently keep passing the value
oracle while its plan degrades — these tests catch that.
"""

from __future__ import annotations

import pytest

from new_kafka_consumer_to_hadoop_hdfs_spark.plans import merged_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return merged_registry()[0]


# Building a query's DataFrame can itself run Spark jobs (IVF collects
# centroids; corpus dedup runs the CC loop to convergence), so cache
# each query's explain string for the whole test module — the hygiene
# loop and the per-query tests then build every plan at most once.
_PLAN_CACHE: dict[str, str] = {}


def _plan(spark, registry, name: str) -> str:
    if name not in _PLAN_CACHE:
        df = registry[name](spark, SF)
        jvm = spark._jvm  # noqa: SLF001
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        _PLAN_CACHE[name] = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    return _PLAN_CACHE[name]


def test_q1_filter_pushed_and_columns_pruned(spark, registry):
    plan = _plan(spark, registry, "q1_pricing_summary")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # 7-column projection must reach the scan: no l_orderkey in ReadSchema
    read = plan.split("ReadSchema", 1)[1][:300]
    assert "l_quantity" in read and "l_orderkey" not in read


def test_q6_all_predicates_pushed(spark, registry):
    plan = _plan(spark, registry, "q6_forecast_revenue")
    pushed = plan.split("PushedFilters", 1)[1][:400]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan"


def test_constant_dims_broadcast(spark, registry):
    """nation/region joins must be broadcast (zero shuffle before agg)."""
    plan = _plan(spark, registry, "join_broadcast_dims")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_global_topk_avoids_full_sort(spark, registry):
    plan = _plan(spark, registry, "sort_topk_global")
    assert "TakeOrderedAndProject" in plan


def test_no_forced_broadcast_on_growing_tables(spark, registry):
    """q3/q5 must leave join strategy for linearly-growing tables
    (customer/supplier) to AQE — a forced hint OOMs at 100TB. The
    logical plan should carry broadcast hints only via the tiny dims."""
    import inspect

    from new_kafka_consumer_to_hadoop_hdfs_spark.plans import relational

    q3_src = inspect.getsource(relational.q3_shipping_priority)
    q5_src = inspect.getsource(relational.q5_local_supplier_volume)
    assert "F.broadcast(" not in q3_src  # customer grows with SF
    # q5 may broadcast nation/region only (constant-size dims)
    for line in q5_src.splitlines():
        if "F.broadcast(" in line:
            assert "F.broadcast(n)" in line or "F.broadcast(r)" in line, (
                f"forced broadcast on growing table: {line.strip()}"
            )


def test_near_dup_never_plans_cartesian(spark, registry):
    """The bucketed near-dup pipeline must never degenerate into an
    all-pairs join — candidate generation is equi-join on band/shingle
    buckets by construction."""
    for name in (
        "dedup_near_minhash",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "dedup_containment",
    ):
        plan = _plan(spark, registry, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_q13_broadcast_join_two_exchanges(spark, registry):
    """Q13's intended shape: left-outer broadcast join (orders side is
    the build side at test SF; at scale Catalyst flips to SMJ on
    stats), first agg reduced map-side, exactly two hash exchanges
    (custkey, then the tiny c_count domain). The r4 bench blip was
    runtime noise — this locks the plan so a real flip is visible."""
    plan = _plan(spark, registry, "q13_customer_distribution")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("+- Exchange") + plan.count(":- Exchange") == 2, plan


def test_embedding_lsh_has_no_global_sort(spark, registry):
    """The LSH pair relation is unbounded (data-dependent output), so a
    presentation sort would be a full range-shuffle of the largest
    intermediate at scale. The plan must carry no range-partitioning
    exchange (round-5 fix: VERDICT r4 item 4). A partition-LOCAL sort
    is fine — groupBy().applyInPandas sorts within hash partitions to
    delimit groups; that never globally orders the relation."""
    plan = _plan(spark, registry, "dedup_embedding_lsh")
    assert "rangepartitioning" not in plan.lower(), plan


def test_kafka_dedup_single_shuffle(spark, registry):
    """The reference dedup plan: exactly one exchange (hash partition on
    the dedup keys) feeding the windowed argmax."""
    plan = _plan(spark, registry, "kafka_dedup_lww")
    # formatted mode lists each node once in the tree ("Exchange (n)")
    # and once in the details ("(n) Exchange"); count tree entries
    assert plan.count("hashpartitioning(") == 1
    assert "partition" in plan.split("hashpartitioning(", 1)[1][:40]


def test_q21_subqueries_stay_hash_joins(spark, registry):
    """Q21's EXISTS/NOT-EXISTS carry a suppkey INEQUALITY next to the
    orderkey equality; the equi component must drive a hash/merge semi
    + anti join — a nested-loop plan here is quadratic in lineitems."""
    plan = _plan(spark, registry, "q21_waiting_suppliers")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_q2_decorrelates_to_single_window(spark, registry):
    """The correlated scalar-MIN must run as ONE window over partkey,
    not a second scan of lineitem + self-join (the naive translation)."""
    plan = _plan(spark, registry, "q2_min_cost_supplier")
    # formatted mode lists a node in the tree ("Window (n)") and again
    # in the details ("(n) Window") — count tree entries only
    assert plan.count("Window (") == 1
    # one lineitem scan only: the ps relation is built once
    assert plan.count("lineitem.parquet") == 1


def test_q16_not_in_is_broadcast_anti(spark, registry):
    plan = _plan(spark, registry, "q16_supplier_part_count")
    assert "LeftAnti" in plan
    # the excluded-supplier set is tiny and must broadcast
    assert "BroadcastExchange" in plan


def test_q20_nested_in_is_semi_join_chain(spark, registry):
    plan = _plan(spark, registry, "q20_excess_shipments")
    assert plan.count("LeftSemi") >= 2
    assert "BroadcastNestedLoopJoin" not in plan


def test_q11_filter_pushed_and_single_lineitem_scan(spark, registry):
    """The per-part aggregate and the grand total must both read the
    persisted filtered relation — not re-scan lineitem twice."""
    plan = _plan(spark, registry, "q11_important_value")
    assert "InMemoryTableScan" in plan


# Single-row scalar broadcasts (q11/q15/q22) legitimately plan a
# BroadcastNestedLoopJoin over ONE row; the two documented brute-force
# correctness baselines and the broadcast-query-side exact kNN pair
# are the only operators allowed an NLJ over data.
NLJ_ALLOWED = {
    "q11_important_value",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    # (dedup_embedding_cosine moved off BNLJ entirely: Arrow-batched
    # matmul against a closure-shipped corpus matrix, no join operator)
    "sim_topk_cosine",         # broadcast query side, != join condition
    "sim_topk_cosine_arrow",
    "sim_topk_cosine_int8",    # same plan as sim_topk_cosine, quantized
    "sim_topk_cosine_int8_stored",  # same plan over pre-quantized storage
    "sim_recall_report",       # topk_cosine core ×3 + one-row count crossJoins
    "pipeline_expectations_report",  # two one-row count aggs crossJoined
    "pipeline_mix_languages",  # one-row global-target scalar broadcast
    "text_tfidf_keywords",     # one-row total-doc-count scalar broadcast
    "event_gapfill_locf",      # one-row global min/max range crossJoin
    "pipeline_similar_docs_report",  # topk_cosine core: != join condition
    "text_collocations_pmi",   # one-row N1/N2 token-total scalar broadcast
    "pipeline_drift_psi",      # one-row grid-range scalar broadcast (the
                               # half totals ride a window, not a join)
}


def test_no_query_plans_cartesian_or_surprise_nlj(spark, registry):
    """Registry-wide plan hygiene: NO registered query may plan a
    CartesianProduct, and BroadcastNestedLoopJoin appears only where
    documented (scalar one-row broadcasts, brute-force baselines).
    Guards every future query at once: an accidental non-equi join or
    a lost equi-condition shows up here, not at 100 TB."""
    failures = []
    for name in sorted(registry):
        plan = _plan(spark, registry, name)
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in NLJ_ALLOWED:
            failures.append(f"{name}: undocumented BroadcastNestedLoopJoin")
    assert not failures, failures


def test_decontaminate_broadcasts_benchmark_grams(spark, registry):
    """The benchmark gram set must reach the corpus probe as a
    broadcast: the corpus side is never shuffled by gram content, and
    no cartesian/nested-loop fallback appears."""
    plan = _plan(spark, registry, "pipeline_decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_filter_is_exchange_free(spark, registry):
    """Quality gating must be one narrow projection + predicate —
    its docstring claims zero shuffles, so the plan may contain no
    Exchange at all."""
    plan = _plan(spark, registry, "pipeline_quality_filter")
    assert "Exchange" not in plan


def test_keep_best_argmax_is_agg_not_window(spark, registry):
    """keep-best's survivor pick must stay a map-side-combinable
    struct-MAX aggregate — its docstring's mega-cluster promise. A
    refactor to row_number() would show up as a Window operator."""
    plan = _plan(spark, registry, "pipeline_dedup_keep_best")
    assert "Window" not in plan, "survivor argmax regressed to a window sort"
    assert "CartesianProduct" not in plan


def test_bigram_surprisal_window_rides_count_table_and_partial_aggs(
    spark, registry
):
    """The bigram-LM build must be a partial-agg wordcount (vocab-sized
    shuffle); the C(w1·) context total (r14) is a sum window over that
    already-aggregated count relation — NEVER a window over the raw
    corpus gram stream. The formatted plan's per-operator detail lists
    each Window's input columns: every Window must consume the count
    column (__c2), proving its input is the vocab-sized count table."""
    import re

    plan = _plan(spark, registry, "text_bigram_surprisal")
    assert "partial_count" in plan, "gram count lost its map-side combine"
    win_ids = re.findall(r"\((\d+)\) Window\b", plan)
    assert win_ids, "context-total window disappeared — plan restructured?"
    for wid in win_ids:
        detail = re.search(
            rf"\({wid}\) Window\n(?:.+\n)*?Input \[\d+\]: \[([^\]]*)\]",
            plan,
        )
        assert detail is not None, f"no Input detail for Window ({wid})"
        assert "__c2" in detail.group(1), (
            "a Window consumes the raw gram stream (no __c2 in its "
            f"input): {detail.group(1)}"
        )


def test_cdc_merge_is_single_shuffle_argmax(spark, registry):
    """CDC compaction must stay a map-side-combinable struct-MAX
    aggregate with ONE corpus shuffle on user_id — never a per-key
    window sort over the changelog."""
    plan = _plan(spark, registry, "pipeline_cdc_merge")
    assert "Window" not in plan, "CDC winner pick regressed to a window"
    assert plan.count("hashpartitioning(") == 1, plan


def test_chunk_sliding_is_exchange_free(spark, registry):
    """The RAG chunker is a pure narrow expansion (sequence +
    posexplode + substring): zero Exchange, one codegen span over the
    scan."""
    plan = _plan(spark, registry, "pipeline_chunk_sliding")
    assert "Exchange" not in plan, plan


def test_heavy_hitters_windows_only_the_vocabulary(spark, registry):
    """The token count must keep its map-side combine (partial_count),
    and the rank window may only run AFTER the aggregate — i.e. over
    the vocabulary-sized count relation, never the raw token stream."""
    plan = _plan(spark, registry, "text_heavy_hitters")
    assert "partial_count" in plan, "token count lost its map-side combine"
    # formatted plans list tree nodes top-down; the Window node must sit
    # above (= earlier in the tree than) the HashAggregate pair.
    tree = plan.split("== Physical Plan ==", 1)[1]
    assert tree.index("Window") < tree.index("HashAggregate"), (
        "rank window ran below the aggregate — it would sort the "
        "corpus-sized token stream at scale"
    )


def test_funnel_has_no_window_and_two_exchanges(spark, registry):
    """The funnel is one conditional-min pivot shuffle on user_id plus
    the 4-value global total — no window functions, no join, no
    per-user sort."""
    plan = _plan(spark, registry, "event_funnel_stages")
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("hashpartitioning(") == 1, plan


def test_retention_single_corpus_shuffle(spark, registry):
    """Retention must shuffle the event stream exactly once (user_id);
    the second exchange regroups the exploded week set — a relation
    bounded by |users| x calendar-weeks, never joined back to the
    corpus."""
    plan = _plan(spark, registry, "event_retention_cohorts")
    assert "Join" not in plan, "cohort join crept back in"
    assert plan.count("hashpartitioning(") == 2, plan


def test_bucketed_join_query_no_fact_exchange(spark, registry):
    """With broadcast disabled, the registered bucketed join must read
    both fact sides exchange-free (the layout carries the partitioning)
    — the only Exchange allowed is the final tiny-domain aggregate.
    Bypasses the module plan cache: this assertion needs its own conf.
    """
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry["join_bucketed_colocated"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange") == 1, plan
        assert "hashpartitioning(o_orderpriority" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_user_paths_single_corpus_shuffle(spark, registry):
    """The lag window is the only corpus-sized shuffle (user_id); the
    transition count and share window run over the |event_types|²
    relation. Three exchanges total, the first on user_id."""
    plan = _plan(spark, registry, "event_user_paths")
    assert plan.count("hashpartitioning(") <= 3, plan
    first_key = plan.split("hashpartitioning(", 1)[1][:30]
    assert "user_id" in first_key, plan


def test_pruned_scan_filter_is_partition_level(spark, registry):
    """The event_type predicate must land in PartitionFilters (metadata
    skip — other partitions' files are never opened), NOT merely in
    PushedFilters (row-group skip after opening). The scan must also
    not read the partition column's siblings' data."""
    plan = _plan(spark, registry, "scan_partition_pruned")
    assert "PartitionFilters" in plan, plan
    part = plan.split("PartitionFilters", 1)[1][:200]
    assert "event_type" in part and "purchase" in part, part


def test_gapfill_single_corpus_shuffle(spark, registry):
    """Only the hourly aggregate may touch the corpus; the grid build
    must be a 1-row broadcast cross join (never data x data), and the
    LOCF window runs over the grid-sized relation."""
    plan = _plan(spark, registry, "event_gapfill_locf")
    assert "CartesianProduct" not in plan, plan
    # the corpus-sized exchanges: hourly agg + global min/max agg
    # (single-partition); the join/window exchanges are grid-sized
    assert plan.count("hashpartitioning(") <= 3, plan


def test_scd2_single_corpus_shuffle(spark, registry):
    """SCD2 shuffles the event stream exactly once, on user_id: the
    change-flag window, the island window, the island aggregation
    (grouping on a SUPERSET of the partitioning key satisfies its
    clustered distribution), and the valid_to lead window all reuse
    that one exchange."""
    plan = _plan(spark, registry, "pipeline_scd2_intervals")
    assert plan.count("hashpartitioning(") == 1, plan
    key = plan.split("hashpartitioning(", 1)[1][:30]
    assert "user_id" in key, plan


def test_centroid_single_mapside_combined_exchange(spark, registry):
    """The per-label centroid is ONE aggregation: partial aggregates
    collapse the exploded (label, dim, val) rows map-side, so the only
    exchange carries |labels| x dim partial sums."""
    plan = _plan(spark, registry, "embedding_centroid_per_label")
    assert plan.count("hashpartitioning(") == 1, plan
    assert "partial_" in plan.lower() or "HashAggregate" in plan, plan


def test_salted_join_shuffles_on_salted_key(spark, registry):
    """With broadcast disabled, the salted join's fact-side exchange
    must partition on (event_type, __salt) — the whole point: a hot
    event_type spreads over salt_buckets reduce tasks instead of one.
    Bypasses the module plan cache: needs its own conf."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = registry["join_salted_skew"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
        # several exchanges exist (the dim-build aggregate partitions on
        # event_type alone); the JOIN's fact-side exchange is the one
        # that must carry the salt
        keys = [
            chunk[:120]
            for chunk in plan.split("hashpartitioning(")[1:]
        ]
        assert any(
            "event_type" in k and "__salt" in k for k in keys
        ), f"no (event_type, __salt) exchange found in: {keys}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_curriculum_never_globally_sorts(spark, registry):
    """The total order is assigned through (stage, shard)-partitioned
    windows + broadcast offsets: NO range partitioning (the global-sort
    exchange) anywhere in the plan."""
    plan = _plan(spark, registry, "pipeline_curriculum_order")
    assert "rangepartitioning" not in plan.lower(), plan


def test_hive_partitioned_read_is_directory_pruned(spark, registry):
    """The partitioned-parquet read-back must carry the lang predicate
    as a PARTITION filter (directory-level pruning: lang=fr/es/zh are
    never listed), not a post-scan row filter."""
    plan = _plan(spark, registry, "sink_parquet_hive_partitioned")
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1][:300]
    assert "lang" in pf and ("en" in pf and "de" in pf), pf


def test_bloom_prefilter_rides_the_fact_scan_stage(spark, registry):
    """The Bloom membership test must be a plain projection filter on
    the lineitem side (xxhash64 + bitmap probes evaluated pre-exchange)
    — no extra join or shuffle may be introduced to apply it."""
    plan = _plan(spark, registry, "join_bloom_prefilter")
    assert "xxhash64" in plan
    # exactly the two exact joins (supplier⋈nation, fact⋈supplier);
    # formatted mode lists each node twice (tree + details), so 2
    # joins → 4 occurrences. The bloom itself adds NO join operator.
    assert plan.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_path_regex_single_corpus_shuffle(spark, registry):
    """Sessionize + island sum + per-session fold must share ONE
    user_id exchange of the event stream (the SCD2 contract); the
    regex adds no shuffle."""
    plan = _plan(spark, registry, "event_path_regex")
    # formatted mode renders each exchange's partitioning once, in its
    # details "Arguments:" line (the kafka_dedup_lww counting idiom)
    assert plan.count("hashpartitioning(") == 1, plan.count("hashpartitioning(")
    assert "user_id" in plan.split("hashpartitioning(", 1)[1][:30]


def test_ewma_single_shuffle_and_jvm_fold(spark, registry):
    """The EWMA fold must ride ONE user_id exchange (collect_list agg)
    with no Python evaluation — `aggregate` is a JVM higher-order
    function, not a UDF."""
    plan = _plan(spark, registry, "event_ewma_smoothing")
    assert plan.count("hashpartitioning(") == 1
    assert "user_id" in plan.split("hashpartitioning(", 1)[1][:30]
    assert "Python" not in plan and "ArrowEval" not in plan


def test_ewma_segmented_two_level_plan(spark):
    """The segmented EWMA fold (`operators/stats.ewma_segmented`) must
    be exactly TWO hash exchanges — (key, segment) partial folds, then
    the per-key affine compose — with no Window, no global sort, and no
    Python evaluation (both folds are JVM higher-order functions).
    This is the plan contract that makes it the mega-key escape hatch:
    task memory is bounded by segment size at level 1 and by segment
    COUNT at level 2, never by a key's full history."""
    from new_kafka_consumer_to_hadoop_hdfs_spark.operators.stats import ewma_segmented
    from new_kafka_consumer_to_hadoop_hdfs_spark.sources.files import load_table

    df = ewma_segmented(load_table(spark, SF, "events"))
    jvm = spark._jvm  # noqa: SLF001
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)  # noqa: SLF001
    assert plan.count("hashpartitioning(") == 2, plan
    first, second = plan.split("hashpartitioning(")[1:]
    # one exchange carries (key, segment) — the segment expression is
    # rendered as an internal _groupingexpression alias — the other the
    # key alone
    keyed = [seg[:80] for seg in (first, second)]
    assert (
        sum("_groupingexpression" in k or "__seg" in k for k in keyed) == 1
    ), keyed
    assert "Window" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan

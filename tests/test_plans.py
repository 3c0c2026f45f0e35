"""Plan-quality gates: the 100 TB posture enforced as tests.

Each test pins a physical-plan property that matters at scale —
broadcast dims, parquet filter pushdown, column pruning, codegen, no
accidental cartesian products — so optimizer regressions fail here
instead of on a cluster.
"""

from __future__ import annotations

import pytest

from reciping_data_pipeline_spark.plans import inspect
from reciping_data_pipeline_spark.queries import all_queries

from .conftest import SF_SMOKE

REGISTRY = all_queries()


def _q(spark, name):
    return REGISTRY[name].fn(spark, SF_SMOKE)


def test_star_join_broadcasts_dims(spark):
    """revenue_by_nation joins fact (lineitem/orders) to small dims —
    every dim join must be broadcast, never a fact shuffle."""
    df = _q(spark, "revenue_by_nation")
    assert inspect.count_broadcast_joins(df) >= 2
    inspect.assert_no_cartesian(df)


def test_filter_pushdown_reaches_parquet(spark):
    """top20_users_by_value filters event_type='purchase' — the
    predicate must appear in PushedFilters at the scan."""
    df = _q(spark, "top20_users_by_value")
    pushed = " ".join(inspect.pushed_filters(df))
    assert "event_type" in pushed, pushed


def test_column_pruning(spark):
    """dau touches ts/user_id/event_type only; the events scan must not
    read value/props (wide payload columns)."""
    cols = inspect.scan_columns(_q(spark, "dau"))
    assert "props" not in cols and "value" not in cols, cols


def test_whole_stage_codegen(spark):
    """The pricing summary aggregation stays inside codegen (AQE wraps
    the pre-execution plan, hiding codegen subtrees — inspect with AQE
    off; execution behavior is identical)."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        assert inspect.has_whole_stage_codegen(_q(spark, "pricing_summary"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_semi_join_for_in_subquery(spark):
    """customers_without_orders anti-join plans as a real join, not a
    nested loop."""
    inspect.assert_no_cartesian(_q(spark, "customers_without_orders"))


def test_knn_broadcasts_queries_not_corpus(spark):
    """Brute-force ANN must broadcast the (tiny) query side against the
    corpus scan; a shuffle here moves the full corpus."""
    df = _q(spark, "embed_knn_brute")
    plan = inspect.simple_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_sessionization_single_exchange(spark):
    """Gap sessionization: both windows and the final groupBy share the
    user_id partitioning — exactly ONE shuffle of the events table."""
    df = _q(spark, "sessionization")
    assert inspect.count_exchanges(df) == 1, inspect.simple_plan(df)


def test_medallion_fact_build_broadcasts_all_dims(spark, tmp_path):
    """The gold fact build must plan 4 broadcast joins (user, recipe,
    event, page) — the fact side never shuffles for a dim join."""
    from datetime import datetime

    from reciping_data_pipeline_spark.pipeline import datagen, runner

    root = str(tmp_path)
    fix = datagen.generate_fixture(root, seed=3, n_users=10, n_days=1)
    wh = f"{root}/wh"
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Seoul")
    try:
        runner.bulk_backfill(
            spark, fix["staging_dir"], wh, fix["recipe_master"], datetime(2025, 9, 2),
            time_dim_range=("2025-09-01 00:00:00", "2025-09-02 23:00:00"),
        )
        from reciping_data_pipeline_spark.pipeline import dims as dims_mod
        from reciping_data_pipeline_spark.pipeline import gold, silver

        fact = gold.build_fact(
            silver.read_silver(spark, wh),
            dims_mod.read_dim(spark, wh, "dim_user"),
            dims_mod.read_dim(spark, wh, "dim_recipe"),
            dims_mod.read_dim(spark, wh, "dim_event"),
            dims_mod.read_dim(spark, wh, "dim_page"),
        )
        assert inspect.count_broadcast_joins(fact) == 4
        assert inspect.count_shuffle_joins(fact) == 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


@pytest.mark.parametrize(
    "name",
    ["pricing_summary", "dau", "revenue_by_nation", "top10_parts_by_revenue", "conversion_funnel"],
)
def test_no_cartesian_products(spark, name):
    inspect.assert_no_cartesian(_q(spark, name))


def test_vocab_topk_uses_take_ordered_not_global_sort(spark):
    """Top-k over token counts must plan as TakeOrderedAndProject
    (bounded per-partition heaps + one merge), never a full Sort of
    the distinct-token set followed by Limit."""
    plan = inspect.simple_plan(_q(spark, "doc_vocab_topk"))
    assert "TakeOrderedAndProject" in plan, plan


def test_grid_cross_join_broadcasts_tiny_side(spark):
    """The day x type densification grid cross-joins two tiny distinct
    sets — the small side must be broadcast (nested-loop on a
    broadcast variable), and the counts join must not SortMergeJoin."""
    df = _q(spark, "event_type_date_grid")
    plan = inspect.simple_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_sequence_packing_single_window_exchange(spark):
    """Sequence packing = one hash exchange on source for the window,
    then the groupBy reuses the same partitioning (no second full
    shuffle of document rows)."""
    df = _q(spark, "doc_sequence_packing")
    assert inspect.count_exchanges(df) <= 2, inspect.simple_plan(df)


def test_variant_query_partial_agg_and_pruned_scan(spark):
    """VARIANT expressions disable whole-stage codegen in Spark 4.1
    (VariantExpressionEvalUtils is interpreted), so the scale
    properties that remain load-bearing are: map-side partial
    aggregation before the single exchange, and a scan pruned to
    exactly (event_type, props)."""
    df = _q(spark, "props_variant_stats")
    plan = inspect.simple_plan(df)
    assert "partial_sum" in plan or "partial_count" in plan, plan
    assert inspect.count_exchanges(df) == 1, plan
    assert inspect.scan_columns(df) == {"event_type", "props"}, inspect.read_schemas(df)


def test_decontamination_broadcasts_eval_side(spark):
    """Decontamination must broadcast the (small) eval shingle set and
    the per-doc hit counts — never shuffle-join the corpus against the
    eval set — and the final doc scan reads only doc_id."""
    df = _q(spark, "doc_decontaminate")
    assert inspect.count_broadcast_joins(df) == 2
    assert inspect.count_shuffle_joins(df) == 0
    inspect.assert_no_cartesian(df)


def test_temperature_mixture_broadcasts_rates(spark):
    """Per-source rates are O(sources) rows — they must broadcast onto
    the token scan, not shuffle it."""
    df = _q(spark, "doc_temperature_mixture")
    assert inspect.count_broadcast_joins(df) >= 1
    assert inspect.count_shuffle_joins(df) == 0


def test_semantic_dedup_join_is_cell_blocked(spark):
    """SemDeDup's pair search must be an equi-join on the cell key
    (quadratic only within cells), never a cartesian product."""
    from reciping_data_pipeline_spark.operators import similarity
    from reciping_data_pipeline_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    pairs = similarity.semantic_dedup_pairs(
        emb, id_col="vec_id", vec_col="embedding", n_cells=8, threshold=0.97
    )
    inspect.assert_no_cartesian(pairs)
    plan = inspect.simple_plan(pairs)
    assert "cell" in plan


def test_winsorize_broadcasts_percentile_bounds(spark):
    """The global [p05,p95] bounds are one row — they must broadcast
    onto the token scan (scalar cross join), never shuffle it."""
    df = _q(spark, "doc_length_winsorize")
    plan = inspect.simple_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or inspect.count_broadcast_joins(df) >= 1
    assert inspect.count_shuffle_joins(df) == 0


def test_timeseries_similarity_no_global_window(spark):
    """Blocked time-series similarity must not funnel all users through
    a single-partition window (the old global-ntile shape): no Window
    node at all, no SinglePartition exchange, no cartesian; top-k via
    TakeOrderedAndProject."""
    df = _q(spark, "user_timeseries_similarity")
    plan = inspect.simple_plan(df)
    assert "Window" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    inspect.assert_no_cartesian(df)


def test_tfidf_does_not_broadcast_vocabulary(spark):
    """The idf side of TF-IDF is vocabulary-sized (10^8+ tokens at web
    scale) and must NOT carry a broadcast hint; only the 1-row corpus
    count broadcasts. Stats-based auto-broadcast is disabled for the
    check so only explicit hints survive planning."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = inspect.simple_plan(_q(spark, "doc_tfidf_topk"))
        assert plan.count("BroadcastExchange") == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_semantic_dedup_cells_scale_with_corpus(spark):
    """The SemDeDup default derives the cell count from the corpus size
    (constant target cell size), so within-cell pair work stays linear
    in the corpus instead of quadratic."""
    from reciping_data_pipeline_spark.operators.similarity import derive_n_cells

    # small corpora floor at min_cells (fit is trivial there and more
    # cells strictly reduce the quadratic within-cell pair term)
    assert derive_n_cells(500, 1024) == 16
    assert derive_n_cells(10_000, 1024) == 16
    assert derive_n_cells(500, 1024, min_cells=1) == 1
    assert derive_n_cells(10_000_000, 1024) == 9766
    # 10x the corpus -> 10x the cells (expected cell size constant).
    assert derive_n_cells(10_240_000, 1024) * 10 == derive_n_cells(102_400_000, 1024)


def test_filtered_knn_semi_join_prunes_corpus(spark):
    """Filtered vector search: the metadata filter must reach the
    corpus as a (broadcast) semi join before any vector math, and the
    query side stays broadcast."""
    df = _q(spark, "embed_filtered_knn")
    plan = inspect.simple_plan(df)
    assert "LeftSemi" in plan
    assert plan.count("BroadcastExchange") >= 2  # keep-list + query set


def test_gini_rank_window_is_band_partitioned(spark):
    """user_value_gini ranks every user globally — the ranking window
    must be partitioned by the value band (operators/ranks), never an
    unpartitioned row_number over the user set."""
    plan = inspect.simple_plan(_q(spark, "user_value_gini"))
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__band" in line, line
    assert "CartesianProduct" not in plan, plan


def test_triangles_all_equi_joins(spark):
    """copurchase_triangles: degree orientation keeps the wedge
    expansion an equi-join on the center vertex — no cartesian
    product anywhere; the only nested-loop joins are the final 1-row
    summary combines."""
    plan = inspect.simple_plan(_q(spark, "copurchase_triangles"))
    assert "CartesianProduct" not in plan, plan


def test_rfm_bounds_are_scalar_broadcast(spark):
    """user_rfm_segments banding joins each user row to ONE scalar
    percentile-bounds row — must be a broadcast nested loop (scalar
    fanout), never a shuffle join of the user set against bounds."""
    df = _q(spark, "user_rfm_segments")
    plan = inspect.simple_plan(df)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_kl_divergence_no_vocab_broadcast(spark):
    """doc_kl_source_divergence joins token-keyed (vocabulary-sized)
    sides — no broadcast HINT may force them; only the 1-row corpus
    total broadcasts. Stats-based auto-broadcast is disabled so only
    explicit hints survive planning (the scale posture: Catalyst may
    still auto-broadcast at toy sizes, which is correct adaptivity)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _q(spark, "doc_kl_source_divergence")
        plan = inspect.simple_plan(df)
        assert plan.count("BroadcastExchange") == 1, plan
        assert inspect.count_shuffle_joins(df) >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_pmi_marginal_joins_are_shuffle(spark):
    """doc_token_pmi_topk joins bigrams to unigram marginals twice —
    both vocabulary-sized, neither may carry a broadcast hint (only
    the two scalar totals broadcast)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _q(spark, "doc_token_pmi_topk")
        plan = inspect.simple_plan(df)
        assert plan.count("BroadcastExchange") == 2, plan
        assert inspect.count_shuffle_joins(df) >= 2, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bm25_topk_is_take_ordered(spark):
    """doc_bm25_topk's top-20 must plan as TakeOrderedAndProject,
    and the postings scan must filter to the query terms (pushed to
    the token explode, not post-aggregation)."""
    df = _q(spark, "doc_bm25_topk")
    assert "TakeOrderedAndProject" in inspect.simple_plan(df), inspect.simple_plan(df)


def test_runtime_bloom_filter_on_selective_shuffle_join(spark):
    """When a big-table join's other side carries a selective filter
    and is NOT broadcastable, Catalyst must inject a runtime bloom
    filter (bloom_filter_agg / might_contain) so the big side's rows
    are pre-filtered BEFORE the shuffle — at 100 TB this is the
    difference between shuffling the full fact table and shuffling
    the ~matching fraction. Thresholds are lowered to make the 10 GB
    application-side gate reachable at test scale; the capability,
    not the threshold, is what's pinned."""
    import pyspark.sql.functions as F

    from reciping_data_pipeline_spark.tables import load_table

    prev_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert inspect.has_runtime_bloom_filter(j), inspect.simple_plan(j)[:2000]
        # sanity: it still executes correctly with the filter injected
        assert j.count() == 1
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_scan,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)


@pytest.mark.parametrize(
    "name,tables",
    [
        ("wau_grouping_sets", 1),
        ("events_per_time_grouping_sets", 1),
        ("daily_engagement_grouping_sets", 1),
        ("pages_views_grouping_sets", 1),
        ("dish_interactions_grouping_sets", 3),
    ],
)
def test_grouping_sets_one_scan_no_union(spark, name, tables):
    """The GROUPING SETS sibling (segment_stack(form='grouping_sets'))
    must plan as ONE scan per input table feeding a single Expand —
    never a Union of per-block rescans. Exchange count stays bounded by
    the two-phase distinct aggregation (<= 3), independent of the
    number of segment blocks. (The REGISTERED default is the UNION ALL
    form — the measured winner hot and cold through x300, see
    BENCH_NOTES.md — so this gate builds the GS form explicitly: the
    one-scan capability must stay intact for the regimes where scans
    do dominate.)"""
    from reciping_data_pipeline_spark.queries import groupingsets

    df = groupingsets.segment_stack(spark, SF_SMOKE, name, form="grouping_sets")
    plan = inspect.simple_plan(df)
    assert "Union" not in plan, plan
    assert plan.count("Scan parquet") == tables, plan
    assert "Expand" in plan, plan
    assert inspect.count_exchanges(df) <= 3, inspect.simple_plan(df)


@pytest.mark.parametrize(
    "name",
    [
        "wau_grouping_sets",
        "events_per_time_grouping_sets",
        "daily_engagement_grouping_sets",
        "pages_views_grouping_sets",
        "dish_interactions_grouping_sets",
    ],
)
def test_segment_stack_default_form_is_union_all(spark, name):
    """The registered catalog entry serves the UNION ALL form (no
    Expand in the plan) and is result-identical to the GROUPING SETS
    sibling — the cross-form equivalence that used to be implicit in
    the driver oracle (Spark-GS vs DuckDB-UA) now pinned engine-side."""
    from reciping_data_pipeline_spark.queries import groupingsets

    df = _q(spark, name)
    plan = inspect.simple_plan(df)
    assert "Expand" not in plan, plan
    assert "Union" in plan, plan
    gs = groupingsets.segment_stack(spark, SF_SMOKE, name, form="grouping_sets")
    assert sorted(map(str, df.collect())) == sorted(map(str, gs.collect()))

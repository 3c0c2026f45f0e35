"""Named query catalog with DuckDB oracle SQL.

Each query is registered with:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation
  (DataFrame API or Spark SQL; Catalyst picks the physical plan).
- ``oracle`` — equivalent ANSI SQL the driver runs in DuckDB over the
  same parquet tables, or ``None`` for non-SQL-expressible operators
  (those get a rows-only check).

Conventions that make the cross-engine value-hash comparison stable:
- every computed column is explicitly aliased, identically on both
  sides (the driver sorts columns by name before hashing);
- every floating-point aggregate is rounded identically on both
  sides (double summation order differs between engines; rounding
  absorbs the last-ulp noise). Display rounding of aggregates may use
  ``round(x, N)``; VALUE-AFFECTING rounding (anything feeding a
  comparison, ranking, or further arithmetic) must use the floor form
  ``floor(x * 10^N + 0.5) / 10^N`` — pure IEEE mul/add/floor that is
  bit-identical across engines, unlike engine ``round()`` tie
  behavior (Spark: BigDecimal-of-shortest-repr HALF_UP; DuckDB:
  binary-value rounding). Medians avoid interpolation builtins
  (explicit middle-rank averaging). Property-gated in
  ``tests/test_properties.py``;
- integer sums are cast to BIGINT on the DuckDB side (DuckDB promotes
  SUM(int) to HUGEINT, Spark keeps BIGINT);
- ties in top-k / ranking are always broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


# Queries that already have a row in a prior round's driver CORRECTNESS
# artifact (r01/r02 checked the same 50; r03 checked the next 50 — see
# CORRECTNESS_r03.json).  The driver verifies the first 50 entries of
# ``queries()`` in dict order, so ``all_queries`` rotates not-yet-verified
# queries to the front; the union of CORRECTNESS_r01..r0N then covers the
# whole catalog.  No-oracle queries (rows-only check) are included once
# their rows-only row has been recorded — re-running them never upgrades
# the check, so the slot is better spent on unchecked queries.
_DRIVER_VERIFIED = frozenset(
    {
        # r01/r02 hash-green
        "dau", "dau_segment_breakdown", "wau_growth", "hourly_heatmap",
        "conversion_funnel", "ab_test_ctr", "ab_test_lift", "engagement_by_day",
        "daily_type_pivot", "sessionization", "props_json_extract",
        "user_first_seen_cohort", "event_value_stats", "top20_users_by_value",
        "props_variant_stats", "props_map_explode",
        "doc_vocab_topk", "doc_bigram_topk", "doc_repetition_stats",
        "doc_length_histogram", "doc_sequence_packing", "event_props_pii_scrub",
        "doc_chunking", "doc_tfidf_topk", "doc_shuffle_shards",
        # r06 hash-green (CORRECTNESS_r06.json): the r05 rotations that
        # came back green, plus the rows-only→hash-oracle upgrades.
        # Deliberately ABSENT so they head the r07 driver window: the
        # two r06 reds (signup_conversion_survival,
        # dish_interactions_grouping_sets — oracle dtype fixed r07) and
        # the other four grouping-sets siblings whose SQL changed r07
        # (grouping() set-disambiguation; integer-unit engagement avg).
        "wau_sketch_rollup", "purchase_multitouch_attribution",
        "doc_ngram_jaccard_pairs", "doc_minhash_lsh_pairs",
        "doc_simhash_pairs", "doc_incremental_minhash_dedup",
        "doc_fuzzy_dedup_e2e", "doc_vocab_heavy_hitters_approx",
        "copurchase_pagerank", "doc_image_decode_fake",
        "doc_weighted_sample", "doc_stratified_weighted_sample",
        "user_loyalty_balance", "dau_approx",
        "event_value_percentiles_approx", "embed_lsh_ann", "embed_ivf_ann",
        "embed_pq_ann", "embed_semantic_dedup",
        "doc_stats_by_lang", "doc_exact_dedup", "doc_fingerprint", "doc_quality",
        "doc_langid", "doc_token_counts", "doc_dedup_groups",
        "doc_train_val_split", "doc_stratified_sample",
        "doc_pretrain_filter_funnel", "doc_source_mixture", "doc_corpus_manifest",
        "doc_media_meta",
        "doc_frame_sample_counts", "doc_image_resize_fake",
        "doc_audio_features_fake", "lineitem_rollup", "order_cube",
        "repeat_users_intersect",
        # r03 hash-green (CORRECTNESS_r03.json)
        "doc_sequence_packing_sharded", "doc_cc_chain_stress",
        "doc_decontaminate", "doc_incremental_dedup", "doc_temperature_mixture",
        "medallion_e2e_inventory", "doc_wav_roundtrip",
        "window_shoppers_except", "value_percentiles",
        "order_ship_latency_band", "purchase_asof_last_view",
        "daily_events_rolling", "orders_events_full_outer",
        "customer_balance_deciles", "nation_metrics_unpivot",
        "order_priority_profile", "user_event_span", "event_type_date_grid",
        "order_value_percentile_rank", "top2_lineitems_lateral",
        "custdist_by_order_count", "top_supplier_revenue",
        "parts_supplier_count", "big_order_customers",
        "high_balance_no_urgent_orders", "pricing_summary",
        "revenue_by_nation", "customers_without_orders",
        "priority_with_late_lines", "top_parts_per_brand",
        "monthly_revenue_growth", "priority_share_by_month",
        "order_segment_breakdown", "latest_order_per_customer",
        "nation_balance_heatmap", "top10_parts_by_revenue",
        "market_segment_pivot", "small_quantity_revenue",
        "promo_revenue_share", "top_returning_customers",
        "embed_label_stats", "embed_knn_brute", "embed_near_dup_blocked",
        "embed_quantize_int8",
        # (the six r03 rows-only entries — dau_approx, percentiles,
        # lsh/ivf/pq ANN, embed_semantic_dedup — were all upgraded to
        # hash oracles in r06 and rotate back into the driver window;
        # the catalog now carries ZERO rows-only checks.)
        # r04 hash-green (CORRECTNESS_r04.json); the two r04 reds
        # (signup_conversion_survival, embed_label_centroids) are
        # deliberately ABSENT so their fixes rotate to the front of the
        # r05 driver window.
        "session_stats_daily", "langid_confusion_matrix", "doc_bm25_topk",
        "doc_kl_source_divergence", "doc_zipf_slope", "doc_source_cap_sample",
        "doc_token_pmi_topk", "doc_ttr_fertility_by_source",
        "doc_unigram_logprob_quality", "returnflag_price_corr",
        "discount_price_slope", "event_type_entropy_daily",
        "value_moments_by_type", "user_value_gini",
        "value_equiwidth_histogram", "priority_segment_chi2",
        "order_interarrival_by_customer", "lineitem_benford_first_digit",
        "copurchase_triangles", "cohort_ltv_curve", "user_rfm_segments",
        "customer_revenue_pareto", "copurchase_lift_topk",
        "event_count_autocorr", "nation_pair_trade_volume",
        "region_market_share_by_year", "part_type_margin_by_year",
        "embed_dim_variance_topk", "embed_centroid_pair_distances",
        "embed_intra_label_cohesion", "embed_norm_quantiles_by_label",
        "doc_length_winsorize", "doc_split_leakage", "doc_ngram_novelty",
        "doc_dup_cluster_histogram", "doc_boilerplate_prefix",
        "doc_token_frequency_spectrum", "embed_filtered_knn",
        "doc_repeated_passages", "user_day_transcripts",
        "user_trailing_7d_value", "user_timeseries_similarity",
        "behavior_path_bigrams", "cohort_retention_matrix",
        "strict_funnel_per_user_day", "event_volume_anomaly_days",
        "source_vocab_drift",
        # (doc_vocab_heavy_hitters_approx was r04 rows-only; upgraded to
        # a direct exact-top-25 oracle in r06 and rotated back in.)
        # r05 hash-green (CORRECTNESS_r05.json); deliberately ABSENT so
        # they rotate to the front of the r06 driver window: the r05 red
        # (signup_conversion_survival, fixed) and the five queries whose
        # arithmetic was re-pinned to integer-unit sums this round
        # (purchase_multitouch_attribution, copurchase_pagerank,
        # user_loyalty_balance, doc_weighted_sample,
        # doc_stratified_weighted_sample).
        "funnel_within_hour",
        "user_longest_streak", "doc_dedup_keep_best",
        "copurchase_label_propagation", "supplier_concurrent_shipments",
        "user_state_intervals", "doc_zorder_skipping",
        "doc_token_index_needle", "dq_expectations", "join_key_skew_profile",
        "part_name_near_duplicates", "event_value_mad_outliers",
        "qty_weighted_median_price_by_flag", "item_cf_similarity_topk",
        "embed_label_centroids",
    }
)


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return
    the full registry, ordered so queries without a prior-round driver
    correctness row come first (the driver checks the first 50)."""
    from reciping_data_pipeline_spark.queries import (  # noqa: F401
        clickstream,
        corpusops,
        graphops,
        groupingsets,
        intervalops,
        layoutops,
        medallionops,
        multimodalops,
        qualityops,
        relational_ext,
        samplingops,
        statops,
        subqueries,
        textops,
        tpch,
        vectorops,
    )
    # curation registers LAST: its queries append after the current
    # unverified backlog so they never displace queries already queued
    # for this round's 50-entry driver verification window.
    from reciping_data_pipeline_spark.queries import curation  # noqa: F401

    unverified = {n: q for n, q in REGISTRY.items() if n not in _DRIVER_VERIFIED}
    verified = {n: q for n, q in REGISTRY.items() if n in _DRIVER_VERIFIED}
    return {**unverified, **verified}

"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``go_pq_cdc_spark`` package: ``plans.REGISTRY`` holds one
entry per implemented operator (SURVEY.md §2) with a Spark plan builder and,
where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_pq_cdc_spark import plans
from go_pq_cdc_spark.session import apply_session_defaults

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    apply_session_defaults(spark)
    return plans.REGISTRY["q1_pricing_summary"].spark_fn(spark, SF0001)


# Gate scheduling: the correctness runner caps at 50 of the registry's
# entries per round, so rows that NEED a fresh driver-green signal run
# FIRST. Rotation invariant: every registry row's latest driver green is
# <= 2 rounds old, PLUS a bounded carry — with 116 registry rows and a
# 50-row cap (116 > 2*50), each round defers (carry + new-query count)
# of the cheapest/most robust rows to position 51+, and those lead the
# NEXT round's head. Round 12 rotation (r11 verdict item 1): the 7
# exactly-2-rounds-old r9-green deferrals lead, then 34 r10-green rows;
# the 9 queries ADDED this round close the cap at 50 exactly; 16
# r10-green rows defer to 51-66 (they lead the r13 head); the 50
# r11-green rows are the freshest signal and trail.
_GATE_HEAD = [
    # r9-green rows deferred past r11's cap — stalest signal, run first
    "q_set_ops",
    "q_json_extract",
    "q_distinct_custs",
    "q_scalar_gauntlet",
    "q_order_priority_count",
    "q_rollup_cube",
    "q_pivot_event_counts",
    # driver-green in CORRECTNESS_r10 (50/50 MATCH), minus the 16
    # deferred below — stalest-but-one
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_bracketed_revenue",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "q22_idle_rich_customers",
    "cdc_op_route_counts",
    "cdc_toast_fill",
    "cdc_latest_state",
    "cdc_commit_order",
    "cdc_snapshot_handoff",
    "snapshot_chunk_stats",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "dedup_cluster_assign",
    "dedup_decontaminate",
    "dedup_simhash_pairs",
    "curation_pipeline",
    "emb_near_dup_lsh",
    "sim_lsh_buckets",
    "pack_token_sequences",
    "sample_stratified_mix",
    "sample_cluster_balanced",
    "train_epoch_order",
    "text_chunk_windows",
    "sample_stratum_topk",
]
# Queries ADDED in round 12 — never driver-checked: 41 head rows + these
# = 50 exactly.
_GATE_NEW = [
    "cdc_heavy_hitters_view",
    "cdc_enrich_dimension",
    "sample_temperature_mix",
    "text_ngram_novelty",
    "text_rarity_score",
    "dedup_stream_pairs",
    "emb_semdedup_stream_pairs",
    "q_cms_frequencies",
    "q_cms_merge",
]
# Deferred to position 51+: r10-green rows displaced by this round's new
# queries + the structural carry — at r12 judging they are exactly 2
# rounds old (the invariant's declared carry) and they lead the r13
# head. Chosen cheapest/most robust first (pure-expression plans
# untouched for rounds).
_GATE_DEFERRED = [
    "q_window_gauntlet",
    "q_funnel_steps",
    "q_cohort_retention",
    "q_kmv_distinct",
    "q_kmv_merge",
    "text_pii_scrub",
    "text_cleanup",
    "text_url_dedup",
    "dedup_semantic",
    "cdc_incremental_agg_view",
    "text_gopher_quality",
    "text_bm25_topk",
    "text_substring_dedup_apply",
    "text_heavy_hitters",
    "cdc_changes_between",
    "emb_dim_stats",
]
_GATE_TAIL = [
    # driver-green in CORRECTNESS_r11 (50/50 MATCH) — freshest signal
    "q_histogram",
    "text_bag_dedup",
    "text_line_dedup",
    "q12_late_shipment_priority",
    "emb_quantize",
    "q_time_bucket_gapfill",
    "q_gapfill_interpolate",
    "q_counter_increase",
    "sample_weighted_docs",
    "split_train_val_test",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
    "sim_cosine_topk",
    "sim_pq_adc_topk",
    "sim_ann_lsh_topk",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "cdc_before_image",
    "cdc_truncate_state",
    "cdc_scd2_intervals",
    "cdc_ack_watermark",
    "cdc_hypertable_mapping",
    "q_asof_last_click",
    "q_range_join_bursts",
    "q_sessionize",
    "q_salted_event_counts",
    "q_full_outer_activity",
    "multimodal_features",
    "text_profile",
    "text_repetition",
    "text_top_tokens",
    "text_token_stats",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "emb_near_dup",
    "q_top_orders_per_segment",
    "q_parts_not_shipped_1995",
    "q_percentiles",
    "q_grouping_sets",
    "q17_small_quantity_revenue",
    "text_substring_dedup",
    "emb_centroid_outliers",
    "cdc_topk_view",
    "cdc_agg_view_minmax",
    "sample_token_budget",
    "sample_upsample_epochs",
]


def _gate_order() -> list[str]:
    names = list(plans.REGISTRY)
    placed = set(_GATE_HEAD) | set(_GATE_NEW) | set(_GATE_DEFERRED) | set(_GATE_TAIL)
    missing = placed - set(names)
    assert not missing, f"gate order references unknown queries: {sorted(missing)}"
    middle = [n for n in names if n not in placed]
    return _GATE_HEAD + _GATE_NEW + _GATE_DEFERRED + middle + _GATE_TAIL


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_defaults(spark)
            return fn(spark, sf_dir)

        return run

    qs = plans.all_queries()
    return {name: wrap(qs[name]) for name in _gate_order()}


def oracle_sql() -> dict[str, str]:
    oracles = plans.all_oracles()
    return {name: oracles[name] for name in _gate_order() if name in oracles}

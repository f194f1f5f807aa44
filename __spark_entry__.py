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
# FIRST. Rotation invariant (amended round 13, r12 verdict item 3):
# every registry row's latest driver green is <= 3 rounds old. With fair
# rotation the worst-case staleness is ceil(registry_size / 50), so <= 3
# holds for any registry up to 150 rows — `_gate_order` asserts that
# bound so growth past it fails loudly instead of silently rotting a row.
#
# Round 14 rotation (optimization round — no new queries): the 30
# r11-green rows deferred past r13's cap lead (3 rounds stale — the
# invariant's worst case), then every row whose PLAN this round's
# optimizations changed (bloom in-plan build, minhash exchange reuse —
# the similarity-family and prefix-sum-percentile attempts were measured
# and REVERTED, so those rows keep their r13 plans and stay in their
# rotation slots), then r12-green rows. Whichever r12-green rows fall past
# position 50 defer automatically and MUST lead the r15 head; the 50
# r13-green rows are the freshest signal and trail.
_GATE_HEAD = [
    # r11-green rows deferred past r13's cap — stalest signal, run first
    "dedup_ngram_jaccard",
    "text_substring_dedup",
    "text_bag_dedup",
    "text_line_dedup",
    "text_profile",
    "text_repetition",
    "text_top_tokens",
    "text_token_stats",
    "multimodal_features",
    "q_time_bucket_gapfill",
    "q_gapfill_interpolate",
    "q_counter_increase",
    "q_asof_last_click",
    "q_range_join_bursts",
    "q_sessionize",
    "q_salted_event_counts",
    "q_full_outer_activity",
    "q_histogram",
    "q_top_orders_per_segment",
    "q_parts_not_shipped_1995",
    "q_percentiles",
    "q_grouping_sets",
    "q12_late_shipment_priority",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_dominant_suppliers",
    "q17_small_quantity_revenue",
]
# Rows whose physical plans the r14 optimizations changed — they need a
# fresh driver green regardless of rotation age. (text_substring_dedup
# and q2_min_cost_supplier were also touched; they already lead in
# _GATE_HEAD.)
_GATE_TOUCHED = [
    "q_bloom_join_prune",
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "curation_pipeline",
]
# r12-green rows (driver-green in CORRECTNESS_r12, 50/50 MATCH) — two
# rounds stale at r14 judging. The first (50 - 30 - len(_GATE_TOUCHED))
# fit under the cap; the remainder defer to 51+ and MUST lead the r15
# head. Ordered most-plan-touched / least-robust first so deferral lands
# on the stock-Catalyst rows untouched for rounds.
_GATE_R12 = [
    "dedup_stream_pairs",
    "emb_semdedup_stream_pairs",
    "emb_near_dup_lsh",
    "cdc_heavy_hitters_view",
    "sim_lsh_buckets",
    "dedup_incremental",
    "text_ngram_novelty",
    "text_rarity_score",
    "sample_temperature_mix",
    "sample_stratum_topk",
    "sample_stratified_mix",
    "sample_cluster_balanced",
    "train_epoch_order",
    "text_chunk_windows",
    "dedup_decontaminate",
    "pack_token_sequences",
    # --- deferral boundary at r14 (rows below land past the cap) ---
    "dedup_simhash_pairs",
    "snapshot_chunk_stats",
    "cdc_op_route_counts",
    "cdc_toast_fill",
    "cdc_latest_state",
    "cdc_commit_order",
    "cdc_snapshot_handoff",
    "cdc_enrich_dimension",
    "q_cms_frequencies",
    "q_cms_merge",
    "q_set_ops",
    "q_json_extract",
    "q_distinct_custs",
    "q_scalar_gauntlet",
    "q_order_priority_count",
    "q_rollup_cube",
    "q_pivot_event_counts",
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
]
_GATE_TAIL = [
    # driver-green in CORRECTNESS_r13 (50/50 MATCH) — freshest signal —
    # minus the rows promoted into _GATE_TOUCHED above
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
    "text_rarity_skew",
    "q_hll_distinct",
    "q_hll_merge",
    "dedup_prefix_jaccard",
    "q_bloom_membership",
    "q_bloom_merge",
    "text_token_diversity",
    "q_kmv_intersect",
    "text_keywords",
    "q_bloom_stream_state",
    "cdc_distinct_view",
    "text_typo_pairs",
    "emb_mad_outliers",
    "cdc_topk_view",
    "cdc_agg_view_minmax",
    "cdc_before_image",
    "cdc_truncate_state",
    "cdc_scd2_intervals",
    "cdc_ack_watermark",
    "cdc_hypertable_mapping",
    "sim_cosine_topk",
    "sim_pq_adc_topk",
    "sim_ann_lsh_topk",
    "sim_ivf_topk",
    "sim_ivfpq_topk",
    "sample_token_budget",
    "sample_upsample_epochs",
    "sample_weighted_docs",
    "split_train_val_test",
    "emb_quantize",
    "emb_near_dup",
    "emb_centroid_outliers",
    "dedup_exact",
]

# correctness-runner cap and the staleness bound it implies
_GATE_CAP = 50
_MAX_STALE_ROUNDS = 3


def _gate_order() -> list[str]:
    names = list(plans.REGISTRY)
    assert len(names) <= _GATE_CAP * _MAX_STALE_ROUNDS, (
        f"registry has {len(names)} rows; fair rotation under the "
        f"{_GATE_CAP}-row cap cannot keep every row's driver green "
        f"<= {_MAX_STALE_ROUNDS} rounds old past {_GATE_CAP * _MAX_STALE_ROUNDS} "
        "rows — fold redundant gate rows or renegotiate the invariant"
    )
    placed = (
        set(_GATE_HEAD) | set(_GATE_TOUCHED) | set(_GATE_R12) | set(_GATE_TAIL)
    )
    missing = placed - set(names)
    assert not missing, f"gate order references unknown queries: {sorted(missing)}"
    middle = [n for n in names if n not in placed]
    return _GATE_HEAD + _GATE_TOUCHED + middle + _GATE_R12 + _GATE_TAIL


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

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
# FIRST. Round 5 produced no driver correctness run (no CORRECTNESS_r05),
# so for round 6 the head is: this round's NEW queries (PQ-ADC, URL
# dedup, text cleanup, KMV merge), then every r5 addition still waiting
# for its first driver row, then every plan r5 reshaped, then the 7
# TPC-H rows whose last driver green is r3. Tail = rows driver-green in
# r4 with code untouched since, re-verified locally at sf0.01 after
# every commit (NOTES_r6.md).
_GATE_HEAD = [
    # r6 new — first driver signal needed
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "text_url_dedup",
    "text_cleanup",
    "q_kmv_merge",
    "sample_cluster_balanced",
    "text_bag_dedup",
    "train_epoch_order",
    "q_funnel_steps",
    "q_cohort_retention",
    "q_histogram",
    # r5 new — still no driver row (r5 had no correctness run)
    "pack_token_sequences",
    "sample_stratified_mix",
    "q15_top_supplier",
    "q21_waiting_suppliers",
    "q12_late_shipment_priority",
    "dedup_incremental",
    "q_window_gauntlet",
    "text_pii_scrub",
    "q_kmv_distinct",
    "emb_quantize",
    "text_line_dedup",
    # plans reshaped in r5 — ivf expression argmax, adaptive widening,
    # NULL-bucket sentinel, one-pass kmeans seeding, q22 broadcast scalar
    "sim_ivf_topk",
    "sim_ann_lsh_topk",
    "sim_cosine_topk",
    "sim_lsh_buckets",
    "emb_near_dup_lsh",
    "dedup_simhash_pairs",
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "dedup_decontaminate",
    "curation_pipeline",
    "q22_idle_rich_customers",
    # last driver green r3 — rotated out r4, r5 run never happened
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_bracketed_revenue",
]
_GATE_TAIL = [
    # rotated out r5: all driver-green in CORRECTNESS_r04, code untouched,
    # locally re-matched vs DuckDB at sf0.01 this session
    "q_json_extract",
    "q_pivot_event_counts",
    "q_distinct_custs",
    "q_percentiles",
    "q_scalar_gauntlet",
    "q_set_ops",
    "q_rollup_cube",
    "q_grouping_sets",
    "q_top_orders_per_segment",
    "q_order_priority_count",
    "q_parts_not_shipped_1995",
    "q17_small_quantity_revenue",
]


def _gate_order() -> list[str]:
    names = list(plans.REGISTRY)
    missing = (set(_GATE_HEAD) | set(_GATE_TAIL)) - set(names)
    assert not missing, f"gate order references unknown queries: {sorted(missing)}"
    middle = [n for n in names if n not in _GATE_HEAD and n not in _GATE_TAIL]
    return _GATE_HEAD + middle + _GATE_TAIL


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

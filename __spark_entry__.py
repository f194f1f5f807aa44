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


# Gate scheduling: rounds 1-2 the correctness runner only reached the first
# 50 of 62 registry entries, so entries that have never had a CORRECTNESS
# row run FIRST (including the two queries new in round 3); the tail holds
# queries already hash-verified green in BOTH earlier rounds with code
# untouched since.
_GATE_HEAD = [
    "dedup_cluster_assign",
    "emb_near_dup_lsh",
    "curation_pipeline",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_bracketed_revenue",
    "q22_idle_rich_customers",
    "q_grouping_sets",
    "q_full_outer_activity",
    "multimodal_features",
    "sim_ann_lsh_topk",
]
_GATE_TAIL = [
    "text_quality",
    "text_langid",
    "text_fingerprint",
    "text_simhash",
    "dedup_exact",
    "q_json_extract",
    "q_pivot_event_counts",
    "q_distinct_custs",
    "q_percentiles",
    "q_scalar_gauntlet",
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

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
# FIRST. For round 4 that is: the 13 queries that erred in r3 (all via the
# single catalog.py Spark-4 regression, now fixed), the 8 rows r3 never
# reached, and the 4 entries whose shape changed this round by folding
# redundant variants (text_profile, q_set_ops, q_rollup_cube,
# snapshot_chunk_stats+markers). The tail holds rows rotated OUT this
# round — every one hash-green in the r3 driver run with its code
# untouched since (named in NOTES_r4.md).
_GATE_HEAD = [
    # r3 err(env) — regression fix must re-green these
    "cdc_toast_fill",
    "cdc_commit_order",
    "cdc_op_route_counts",
    "cdc_ack_watermark",
    "cdc_snapshot_handoff",
    "cdc_latest_state",
    "cdc_before_image",
    "cdc_truncate_state",
    "cdc_scd2_intervals",
    "q_sessionize",
    "q_asof_last_click",
    "q_range_join_bursts",
    "q_full_outer_activity",
    # untested in r3 (driver cap)
    "q_json_extract",
    "q_pivot_event_counts",
    "q_distinct_custs",
    "q_percentiles",
    "q_scalar_gauntlet",
    "dedup_exact",
    "q_salted_event_counts",
    "cdc_hypertable_mapping",
    # folded/reshaped this round
    "text_profile",
    "q_set_ops",
    "q_rollup_cube",
    "snapshot_chunk_stats",
    # new operators this round — first driver signal needed
    "dedup_decontaminate",
    "text_repetition",
]
_GATE_TAIL = [
    # rotated out r4: all driver-green in CORRECTNESS_r03, code untouched
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q18_large_volume_customers",
    "q19_bracketed_revenue",
    "q22_idle_rich_customers",
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

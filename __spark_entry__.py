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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_session_defaults(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return plans.all_oracles()

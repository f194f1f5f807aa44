"""Table catalog over the engine's captured tables.

In production the engine's snapshot+CDC pipeline materializes each captured
PostgreSQL table as parquet/Delta; the test harness substitutes the driver's
TESTDATA parquet for the capture output behind the same interface
(SURVEY.md §7 M1: "read side substitutes parquet for JDBC behind the same
planner interface").
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (their
# cardinality is fixed or near-fixed: region=5, nation=25).
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), read as long nanos under
        # spark.sql.legacy.parquet.nanosAsLong; convert to a micros
        # timestamp with exact integer division (DuckDB sees TIMESTAMP_NS
        # and epoch_us() truncates identically).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each captured table as a temp view for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

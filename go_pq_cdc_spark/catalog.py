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
        # events.ts is parquet TIMESTAMP(NANOS). How it loads depends on the
        # Spark major version, so branch on the observed dtype rather than a
        # config flag:
        #   - Spark 3 + spark.sql.legacy.parquet.nanosAsLong=true: long nanos;
        #     convert with exact integer division (DuckDB's epoch_us()
        #     truncates identically).
        #   - Spark 4: the legacy flag was removed; NANOS loads natively as
        #     TIMESTAMP_NTZ truncated to micros. Cast to session-tz TIMESTAMP
        #     (session tz is pinned UTC) so the schema matches the Spark-3
        #     path and DuckDB's CAST(ts AS TIMESTAMP) to the microsecond.
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts", "")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type.startswith("timestamp") and ts_type != "timestamp":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each captured table as a temp view for the SQL surface."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""O31: TimescaleDB chunk→hypertable remapping as a reusable operator.

The reference polls the Timescale catalog on a ticker and keeps a shared
chunk→hypertable map (`pq/timescaledb/hypertable.go:35-116` SyncHyperTables
/ FindHyperTables); delivered events arriving under physical chunk names
(`_timescaledb_internal._hyper_*_chunk`) are re-attributed to their logical
hypertable. Spark-first shape: the map is tiny (one row per chunk), so the
remap is a broadcast equi-join — no shuffle of the event stream — and a
"refresh" is just swapping in a newer mapping DataFrame before the next
micro-batch/query.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hypertable_mapping_sql() -> str:
    """Catalog query producing the chunk→hypertable map
    (hypertable.go:47 FindHyperTables)."""
    return (
        "SELECT h.hypertable_schema, h.hypertable_name, "
        "c.chunk_schema, c.chunk_name "
        "FROM timescaledb_information.chunks c "
        "JOIN timescaledb_information.hypertables h "
        "ON c.hypertable_schema = h.hypertable_schema "
        "AND c.hypertable_name = h.hypertable_name"
    )


def mapping_df(
    spark: SparkSession, rows: list[tuple[str, str, str, str]]
) -> DataFrame:
    """Build the mapping DataFrame from catalog rows
    (hypertable_schema, hypertable_name, chunk_schema, chunk_name) —
    keyed the way the reference keys its map (chunk qualified name ->
    hypertable qualified name, hypertable.go:110)."""
    df = spark.createDataFrame(
        rows,
        "hypertable_schema string, hypertable_name string, "
        "chunk_schema string, chunk_name string",
    )
    return df.select(
        F.concat_ws(".", "chunk_schema", "chunk_name").alias("chunk_table"),
        F.concat_ws(".", "hypertable_schema", "hypertable_name").alias("hypertable"),
    )


def remap_hypertables(
    df: DataFrame, mapping: DataFrame, chunk_col: str = "chunk_table"
) -> DataFrame:
    """Re-attribute events on physical chunks to their hypertable via a
    broadcast join (left: unknown chunks pass through with NULL hypertable,
    mirroring the reference's map-miss behavior where the event keeps its
    physical name until the next catalog sync)."""
    return df.join(F.broadcast(mapping), on=chunk_col, how="left")


class HypertableMapper:
    """The reference's ticker loop (SyncHyperTables, hypertable.go:35-45)
    re-expressed driver-side: `refresh()` re-reads the catalog through any
    `run_sql` connection and swaps the broadcastable mapping; `remap()`
    always joins against the newest map. Missing-relation errors (Timescale
    not installed, SQLSTATE 42P01) disable further polling, as the
    reference does (hypertable.go:52-58)."""

    def __init__(
        self,
        spark: SparkSession,
        run_sql: Callable[[str], list[tuple]],
        min_refresh_interval_s: float = 1.0,
    ):
        self.spark = spark
        self.run_sql = run_sql
        self.min_refresh_interval_s = min_refresh_interval_s
        self._mapping: DataFrame | None = None
        self._last_refresh = 0.0
        self._disabled = False

    def refresh(self, force: bool = False) -> DataFrame | None:
        if self._disabled:
            return self._mapping
        now = time.monotonic()
        if not force and self._mapping is not None and (
            now - self._last_refresh < self.min_refresh_interval_s
        ):
            return self._mapping
        try:
            rows = [tuple(r) for r in self.run_sql(hypertable_mapping_sql())]
        except Exception as e:  # relation missing => not a Timescale server
            if "42P01" in str(e):
                self._disabled = True
                return self._mapping
            raise
        self._mapping = mapping_df(self.spark, rows)
        self._last_refresh = now
        return self._mapping

    def remap(self, df: DataFrame, chunk_col: str = "chunk_table") -> DataFrame:
        mapping = self.refresh()
        if mapping is None:
            return df.withColumn("hypertable", F.lit(None).cast("string"))
        return remap_hypertables(df, mapping, chunk_col)

"""Remaining reference-operator parity queries: ack/offset tracking (O19)
and TimescaleDB chunk→hypertable mapping (O31)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import commit_order
from ..sources.changelog import DUCKDB_CHANGELOG_CTE, committed_changelog
from .registry import register

_BASE = f"WITH {DUCKDB_CHANGELOG_CTE}"


@register(
    "cdc_ack_watermark",
    oracle=f"""
    {_BASE},
    ordered AS (
        SELECT lsn, xid,
               MAX(lsn) OVER (PARTITION BY xid) AS commit_lsn
        FROM committed
    )
    SELECT xid,
           MAX(commit_lsn) AS confirmed_lsn,
           COUNT(*) AS n_acked
    FROM ordered
    GROUP BY xid
    """,
    tags=("cdc", "ack"),
)
def cdc_ack_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O19 offset/ack tracking: the confirmed-LSN watermark advances to the
    txn end LSN once a transaction's events are processed (the reference
    rewrites the last event's position to TransactionEndLSN and acks that,
    stream.go:605-633). Per-txn confirmed LSN + ack counts."""
    df = commit_order(committed_changelog(spark, sf_dir))
    return df.groupBy("xid").agg(
        F.max("commit_lsn").alias("confirmed_lsn"),
        F.count(F.lit(1)).alias("n_acked"),
    )


@register(
    "cdc_hypertable_mapping",
    oracle=f"""
    {_BASE},
    physical AS (
        -- events arrive under physical chunk names (the Timescale layout)
        SELECT *,
               '_hyper_1_' || CAST(pk % 5 AS VARCHAR) || '_chunk' AS chunk_name
        FROM committed WHERE tbl <> 'cdc_heartbeat'
    ),
    chunk_map AS (
        -- timescaledb_information.chunks x hypertables catalog snapshot
        SELECT DISTINCT chunk_name, 'public.metrics' AS hypertable FROM physical
    )
    SELECT hypertable, chunk_name, COUNT(*) AS n_events
    FROM physical JOIN chunk_map USING (chunk_name)
    GROUP BY hypertable, chunk_name
    """,
    tags=("cdc", "timescale"),
)
def cdc_hypertable_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O31: events on physical Timescale chunks re-attributed to their
    logical hypertable via a broadcast-joined catalog map
    (`pq/timescaledb/hypertable.go:35-116` polls the catalog; here the map
    is derived deterministically so the oracle can rebuild it)."""
    from ..operators.timescale import remap_hypertables

    df = committed_changelog(spark, sf_dir).filter(F.col("tbl") != "cdc_heartbeat")
    physical = df.withColumn(
        "chunk_name",
        F.concat(F.lit("_hyper_1_"), (F.col("pk") % 5).cast("string"), F.lit("_chunk")),
    )
    chunk_map = (
        physical.select("chunk_name").distinct().withColumn("hypertable", F.lit("public.metrics"))
    )
    return (
        remap_hypertables(physical, chunk_map, chunk_col="chunk_name")
        .groupBy("hypertable", "chunk_name")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "q_salted_event_counts",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("relational", "skew"),
)
def q_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: partial counts on (key, salt)
    spread a hot key over 16 reducers, final combine on key — provably
    identical to the plain GROUP BY the oracle runs."""
    from ..catalog import load_table
    from ..operators.scale import salted_agg_counts

    return salted_agg_counts(load_table(spark, sf_dir, "events"), "event_type")


# O22 snapshot BEGIN/DATA/END markers are gated by `snapshot_chunk_stats`
# (plans/cdc.py), which folds the former `snapshot_markers` query into the
# chunk-planner gate row — one registry entry covers both operators.

"""Structured Streaming surface of the engine (SURVEY.md §7 M2/M3).

Transport: the stream source reads change-event batches from a directory
(parquet/json files) — the transport-agnostic seam the reference fills with
its replication socket (O1-O3). In production the same DataFrame shape
comes from a Kafka topic fed by wal2json/pgoutput, or from the
`sources.postgres` poll reader; every operator downstream is identical.

Apply idiom (M3): `mirror_sink` maintains a queryable current-state mirror
of the captured table via foreachBatch + max-LSN-wins merge — the
Spark-native replacement for the reference's ordered callback delivery
(O21), giving effectively-once semantics on top of at-least-once delivery
because the merge is idempotent (SURVEY.md §2.2 'Exactly-once').
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# Flat envelope used by the streaming tests/fixtures (a typed projection of
# envelope.CHANGE_EVENT_SCHEMA for a single table).
FLAT_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("xid", T.LongType(), True),
        T.StructField("commit_ts", T.TimestampType(), True),
        T.StructField("pk", T.LongType(), False),
        T.StructField("after_val", T.DoubleType(), True),
    ]
)


def changelog_stream(
    spark: SparkSession, path: str, schema: T.StructType = FLAT_CHANGE_SCHEMA
) -> DataFrame:
    """File-transport change stream; one file = one WAL segment's worth of
    events. maxFilesPerTrigger bounds batch size (the analogue of the
    reference's 1000-message channel backpressure, stream.go:93)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def merge_mirror_batch(batch_df: DataFrame, state_dir: str) -> None:
    """Idempotent TOAST-aware max-LSN-wins merge of one micro-batch into
    the parquet mirror (Delta MERGE stand-in; same keyed upsert semantics).

    The mirror row is the old image for TOAST repair: a NULL new-image
    value in the batch inherits the stored value (unless a DELETE
    intervenes) — the same `operators.cdc.toast_fill` epoch logic used
    batch-side, so stream-maintained state equals batch `latest_state`
    over the full log. Atomic directory swap; at scale this is a
    Delta/Iceberg MERGE partitioned by pk bucket."""
    from ..operators.cdc import toast_fill

    spark = batch_df.sparkSession
    cur_path = os.path.join(state_dir, "current")
    incoming = batch_df.select("pk", "lsn", "op", "after_val")
    if os.path.exists(cur_path):
        existing = spark.read.parquet(cur_path).select("pk", "lsn", "op", "after_val")
        merged = existing.unionByName(incoming)
    else:
        merged = incoming
    # One explicit shuffle on pk up front: hash(pk) satisfies the clustering
    # requirement of ALL the windows below (incl. the (pk,lsn) dedup —
    # subset rule), so the whole merge runs on a single exchange.
    par = spark.sparkContext.defaultParallelism
    merged = merged.repartition(par, F.col("pk"))
    # At-least-once replay can re-deliver the event whose LSN equals the
    # stored mirror row's — dedupe (pk, lsn) preferring the stored 'R' row
    # (it already carries the TOAST-repaired value) so the fill window
    # never sees an ambiguous tie.
    w_dup = Window.partitionBy("pk", "lsn").orderBy(
        F.desc(F.col("op") == "R")
    )
    merged = (
        merged.withColumn("dup_rn", F.row_number().over(w_dup))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    filled = toast_fill(merged)
    w = Window.partitionBy("pk")
    state = (
        filled.withColumn("max_lsn", F.max("lsn").over(w))
        .filter((F.col("lsn") == F.col("max_lsn")) & (F.col("op") != "D"))
        .select(
            "pk",
            "lsn",
            F.lit("R").alias("op"),
            F.col("filled_val").alias("after_val"),
        )
    )
    tmp_path = os.path.join(state_dir, "next")
    state.write.mode("overwrite").parquet(tmp_path)
    # Re-point 'current' at the new snapshot (atomic rename swap).
    old_path = os.path.join(state_dir, "old")
    if os.path.exists(old_path):
        __import__("shutil").rmtree(old_path)
    if os.path.exists(cur_path):
        os.rename(cur_path, old_path)
    os.rename(tmp_path, cur_path)


def mirror_sink(stream_df: DataFrame, state_dir: str, checkpoint_dir: str):
    """Attach the mirror-maintenance sink to a change stream. Returns the
    StreamingQuery; call processAllAvailable() to drain in tests."""
    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda batch_df, _epoch: merge_mirror_batch(batch_df, state_dir))
        .start()
    )


def multi_mirror_sink(
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    table_col: str = "tbl",
):
    """O17 fan-out apply: one slot carries every published table's events;
    each micro-batch is split by table and merged into that table's mirror.
    The per-table loop is driver-side control flow only — each merge is a
    distributed job (tables per batch are few; rows are many)."""

    def apply(batch_df: DataFrame, _epoch: int) -> None:
        tables = [r[0] for r in batch_df.select(table_col).distinct().collect()]
        for t in tables:
            merge_mirror_batch(
                batch_df.filter(F.col(table_col) == t).drop(table_col),
                os.path.join(state_root, t.replace(".", "__")),
            )

    return (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply)
        .start()
    )

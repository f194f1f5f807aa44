"""Distributed chunked snapshot over the repo's own wire client — the
ZERO-DEPENDENCY production snapshot path.

`snapshot_jdbc_options` documents a caveat it cannot retire: the JDBC
driver may toggle autocommit around `sessionInitStatement`, silently
voiding `SET TRANSACTION SNAPSHOT` (a pin outside an open transaction is
a WARNING no-op), and no PostgreSQL JDBC jar ships with Spark anyway.
This module is the path with NO such unknowns: each Spark task dials
PostgreSQL itself through `replication_client.ReplicationConnection`
(stdlib sockets, the same client the live suite proves), opens an
explicit REPEATABLE READ transaction, pins the coordinator's exported
snapshot, and reads exactly one planner chunk — the reference's
worker-per-chunk snapshot (`pq/snapshot/worker.go:150-200` with
`coordinator.go:105-180`'s exported snapshot), executed as a Spark job.

Scale shape: one task per chunk (the planner already sizes chunks to
`chunk_size` rows), connections fan out from the EXECUTORS — the driver
never materializes rows. At 1000 executors this is 1000 concurrent
sessions against the server, same as the JDBC fan-out; bound it with the
planner's chunk count / `spark.sql.shuffle.partitions`, and make sure
`max_connections` covers the pool (the reference ships the identical
constraint in its worker-count config).

Text-protocol typing: the simple-query protocol returns text columns;
rows surface as strings and are cast JVM-side per the declared DDL
(Catalyst `cast`, which accepts PostgreSQL's literal conventions:
't'/'f' booleans, ISO timestamps, plain decimal text). Array/jsonb
columns arrive as PostgreSQL text literals ('{1,2}') — project them
through `envelope.typed_projection` conventions downstream if needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import TableConfig
from ..snapshot.planner import SnapshotPlan, Strategy
from .postgres import (
    chunk_query,
    offset_chunk_subquery,
    snapshot_offset_dbtables,
)


def _socket_fetch(conn_args: dict, snapshot_id: str | None, sql: str):
    """Executor-side: fresh connection, pin the exported snapshot inside
    an explicit transaction (live-verified semantics — a pin without an
    open transaction is silently void), fetch one chunk, close."""
    from .replication_client import ReplicationConnection

    conn = ReplicationConnection.connect(**conn_args, replication=False)
    try:
        if snapshot_id:
            conn.simple_query("BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ")
            conn.simple_query(f"SET TRANSACTION SNAPSHOT '{snapshot_id}'")
        rows = conn.simple_query(sql)
        if snapshot_id:
            conn.simple_query("COMMIT")
        return rows
    finally:
        conn.close()


def chunk_sqls(
    table: TableConfig, plan: SnapshotPlan, condition: str | None = None
) -> list[str]:
    """One SELECT per planner chunk. WHERE-range strategies reuse
    `chunk_query` (projection + chunk predicate + queryCondition, O15/O16);
    the OFFSET strategy needs its LIMIT/OFFSET subquery form."""
    if plan.strategy is Strategy.OFFSET:
        return [
            f"SELECT * FROM {sub}"
            for sub in snapshot_offset_dbtables(table, plan, condition)
        ]
    return [chunk_query(table, c.where, condition) for c in plan.chunks]


def snapshot_socket_read(
    spark: SparkSession,
    conn_args: dict,
    table: TableConfig,
    plan: SnapshotPlan,
    schema_ddl: str,
    snapshot_id: str | None = None,
    condition: str | None = None,
    fetch=_socket_fetch,
) -> DataFrame:
    """Whole-table snapshot as ONE distributed read: len(plan.chunks)
    partitions, each fetching its chunk over its own pinned socket
    session. `schema_ddl` declares the SELECTed columns in order (the
    table's column list / `table.columns` projection). `fetch` is the
    executor-side fetch seam — injectable for tests; production default
    dials the server.

    The exported snapshot (`snapshot_id`) must stay valid for the whole
    job: the coordinator's REPEATABLE READ transaction (the one that ran
    `pg_export_snapshot()`) has to remain open until this DataFrame is
    fully consumed — same lifetime rule as the reference coordinator and
    the JDBC path."""
    fields = spark.createDataFrame([], schema_ddl).schema
    names = [f.name for f in fields]
    str_schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
    sqls = chunk_sqls(table, plan, condition)
    src = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sqls)], "chunk_index int, sql string"
    ).repartition(max(len(sqls), 1), "chunk_index")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            for sql in pdf["sql"]:
                rows = fetch(conn_args, snapshot_id, sql)
                yield pd.DataFrame(
                    {n: [r[k] for r in rows] for k, n in enumerate(names)},
                    dtype=object,
                )

    text = src.mapInPandas(gen, str_schema)
    return text.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in fields]
    )


def cooperative_chunk_sql(
    table: TableConfig, chunk: dict, condition: str | None = None
) -> str:
    """SELECT for ONE queue chunk dict (`chunk_queue.manifest_from_plan`
    shape). WHERE-range strategies go through `chunk_query`; OFFSET chunks
    carry the planner's `__offset_chunk__ ORDER BY ... LIMIT ... OFFSET ...`
    sentinel (planner.plan_offset), which is a subquery form, NOT a WHERE
    predicate — passing it to chunk_query would render
    `WHERE __offset_chunk__ ...`, a PostgreSQL syntax error at seed time
    for every PK-less table (r8 advisor)."""
    if chunk.get("partition_strategy") == Strategy.OFFSET.value or str(
        chunk.get("where", "")
    ).startswith("__offset_chunk__"):
        sub = offset_chunk_subquery(
            table, chunk["where"], chunk["limit"], chunk["offset"],
            chunk["chunk_index"], condition,
        )
        return f"SELECT * FROM {sub}"
    return chunk_query(table, chunk["where"], condition)


def make_socket_chunk_reader(
    spark: SparkSession,
    conn_args: dict,
    schema_ddl: str,
    snapshot_id: str | None = None,
    condition: str | None = None,
    fetch=_socket_fetch,
):
    """`chunk_reader(tcfg, chunk)` factory for `engine.start`'s
    cooperative per-chunk seed: each claimed chunk becomes a one-partition
    distributed read over its own pinned socket session — the
    queue decides WHO reads a chunk, this decides HOW (executor-side, no
    driver materialization, no JDBC jar)."""

    def reader(tcfg: TableConfig, chunk: dict) -> DataFrame:
        fields = spark.createDataFrame([], schema_ddl).schema
        names = [f.name for f in fields]
        str_schema = T.StructType(
            [T.StructField(n, T.StringType()) for n in names]
        )
        sql = cooperative_chunk_sql(tcfg, chunk, condition)
        src = spark.createDataFrame([(0, sql)], "chunk_index int, sql string")

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                for s in pdf["sql"]:
                    rows = fetch(conn_args, snapshot_id, s)
                    yield pd.DataFrame(
                        {n: [r[k] for r in rows] for k, n in enumerate(names)},
                        dtype=object,
                    )

        text = src.mapInPandas(gen, str_schema)
        return text.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in fields]
        )

    return reader

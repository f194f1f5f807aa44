"""O14 — catalog-driven planner statistics.

The reference resolves each snapshot table's partitioning inputs from the
server catalogs before planning (`pq/snapshot/coordinator.go:578-644` PK
resolution via pg_index, `:971-1059` MIN/MAX + relpages/reltuples): this
module emits the same catalog SQL and assembles a `TableStats` the
`snapshot.planner.plan_auto` strategy detector consumes — so `plan_auto`
works from a connection, not hand-fed numbers.

Like the rest of the PG seam, SQL execution goes through an injected
`run_sql(sql) -> list[tuple]` (no server in the test container); the SQL
text and the assembly logic are unit-tested."""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from .config import TableConfig
from .snapshot.planner import DEFAULT_CHUNK_SIZE, SnapshotPlan, plan_auto

RunSql = Callable[[str], Sequence[tuple]]

# Integer-typed PKs qualify for range chunking (coordinator.go:655-668).
INTEGER_PK_TYPES = {"smallint", "integer", "bigint", "int2", "int4", "int8"}


def pk_columns_sql(table: TableConfig) -> str:
    """Primary-key columns in index order (coordinator.go:578-621 shape,
    via pg_index/pg_attribute)."""
    return (
        "SELECT a.attname, format_type(a.atttypid, a.atttypmod) AS col_type "
        "FROM pg_index i "
        "JOIN pg_attribute a ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey) "
        f"WHERE i.indrelid = '{table.qualified}'::regclass AND i.indisprimary "
        "ORDER BY array_position(i.indkey, a.attnum)"
    )


def relstats_sql(table: TableConfig) -> str:
    """Planner block stats (coordinator.go:864-880: relpages/reltuples)."""
    return (
        "SELECT c.relpages, c.reltuples FROM pg_class c "
        f"WHERE c.oid = '{table.qualified}'::regclass"
    )


def minmax_sql(table: TableConfig, pk_column: str, condition: str | None = None) -> str:
    """Integer-range bounds (coordinator.go:1028-1059)."""
    where = f" WHERE {condition}" if condition else ""
    return f"SELECT MIN({pk_column}), MAX({pk_column}) FROM {table.qualified}{where}"


def count_sql(table: TableConfig, condition: str | None = None) -> str:
    """Offset-fallback row count (coordinator.go:941-951)."""
    where = f" WHERE {condition}" if condition else ""
    return f"SELECT COUNT(*) FROM {table.qualified}{where}"


@dataclass
class TableStats:
    pk_column: str | None
    pk_type: str | None
    min_val: int | None
    max_val: int | None
    relpages: int | None
    reltuples: float | None
    total_rows: int | None

    @property
    def integer_pk(self) -> str | None:
        if self.pk_column and (self.pk_type or "").lower() in INTEGER_PK_TYPES:
            return self.pk_column
        return None


def table_stats(
    run_sql: RunSql, table: TableConfig, condition: str | None = None
) -> TableStats:
    """Resolve exactly the stats the chosen strategy needs (the reference
    also queries lazily: MIN/MAX only for integer PKs, COUNT only when the
    ctid path is unusable)."""
    pk_rows = list(run_sql(pk_columns_sql(table)))
    # Single-column PK only — composite PKs fall back to ctid chunking,
    # same as the reference (coordinator.go:646-668).
    pk_column, pk_type = (pk_rows[0][0], pk_rows[0][1]) if len(pk_rows) == 1 else (None, None)
    stats = TableStats(
        pk_column=pk_column,
        pk_type=pk_type,
        min_val=None,
        max_val=None,
        relpages=None,
        reltuples=None,
        total_rows=None,
    )
    if stats.integer_pk:
        mn, mx = list(run_sql(minmax_sql(table, stats.pk_column, condition)))[0]
        stats.min_val = None if mn is None else int(mn)
        stats.max_val = None if mx is None else int(mx)
        if stats.min_val is not None:
            return stats  # range strategy decided; no more catalog reads
    rel = list(run_sql(relstats_sql(table)))
    if rel:
        stats.relpages = None if rel[0][0] is None else int(rel[0][0])
        stats.reltuples = None if rel[0][1] is None else float(rel[0][1])
    if not stats.relpages or (stats.reltuples or 0) <= 0:
        # never-analyzed or empty table: ctid math would divide by garbage
        # (coordinator.go:883-900 falls back the same way) -> offset strategy
        stats.relpages = None
        stats.reltuples = None
        stats.total_rows = int(list(run_sql(count_sql(table, condition)))[0][0])
    return stats


def plan_from_connection(
    run_sql: RunSql,
    table: TableConfig,
    condition: str | None = None,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> SnapshotPlan:
    """O13+O14 end to end: catalog stats -> strategy auto-detect -> plan."""
    s = table_stats(run_sql, table, condition)
    return plan_auto(
        integer_pk=s.integer_pk,
        min_val=s.min_val,
        max_val=s.max_val,
        relpages=s.relpages,
        reltuples=s.reltuples,
        total_rows=s.total_rows,
        chunk_size=chunk_size,
    )

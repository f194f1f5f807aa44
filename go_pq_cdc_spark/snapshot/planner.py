"""M1 — chunked-snapshot planner (reference operators O10-O14).

The reference's best idea is its 3-strategy chunk planner for consistent
parallel snapshots (`pq/snapshot/coordinator.go:646-969`). In Spark the
*execution* side is just a partitioned read — the planner's job is to emit
partition specs:

  * integer-range  → JDBC `partitionColumn/lowerBound/upperBound/numPartitions`
                     or an explicit predicate per chunk
                     (ref `createRangeChunksWithConn`, coordinator.go:731-794)
  * ctid-block     → JDBC `predicates=[...]` of physical block ranges
                     (ref `createCTIDBlockChunksWithConn`, coordinator.go:797-892)
  * offset         → LIMIT/OFFSET predicates, slow fallback for PK-less tables
                     (ref `createOffsetChunksWithConn`, coordinator.go:922-969)

Auto-detection (ref `createChunksAutoDetectConn`, coordinator.go:646-729):
integer PK → range; else ctid; else offset.

Scale note: chunk count is linear in table size with O(1) planner state —
at 100 TB a 10^6-chunk plan is a small driver-side list; Spark's scheduler
replaces the reference's DB-backed work-claiming queue (O23) entirely.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CHUNK_SIZE = 8000  # reference default, config/config.go:113-114


class Strategy(str, Enum):
    INTEGER_RANGE = "integer_range"
    CTID_BLOCK = "ctid_block"
    OFFSET = "offset"


@dataclass(frozen=True)
class Chunk:
    """One snapshot work unit (ref `pq/snapshot/job.go:31-54`). Exactly one
    of (range bounds) / (block bounds) / (limit+offset) is meaningful,
    matching the reference's Chunk struct fields."""

    index: int
    where: str  # transport-level predicate (SQL against the source)
    range_start: int | None = None
    range_end: int | None = None  # inclusive, like the reference's BETWEEN
    block_start: int | None = None
    block_end: int | None = None
    limit: int | None = None
    offset: int | None = None


@dataclass
class SnapshotPlan:
    strategy: Strategy
    chunks: list[Chunk] = field(default_factory=list)
    pk_column: str | None = None
    chunk_size: int = DEFAULT_CHUNK_SIZE

    @property
    def predicates(self) -> list[str]:
        """Feed straight into ``spark.read.jdbc(..., predicates=...)`` —
        one Spark input partition per reference chunk."""
        return [c.where for c in self.chunks]

    def chunk_id_expr(self, col: str | Column) -> Column:
        """Integer-range plans only: the closed-form chunk assignment
        ``floor((pk - lo) / width)`` — used to verify the planner against
        parquet data where per-chunk predicates can't be pushed to a DB."""
        if self.strategy is not Strategy.INTEGER_RANGE or not self.chunks:
            raise ValueError("chunk_id_expr requires a non-empty integer-range plan")
        lo = self.chunks[0].range_start
        width = self.chunk_size
        c = F.col(col) if isinstance(col, str) else col
        return F.floor((c - F.lit(lo)) / F.lit(width)).cast("int")


def plan_integer_range(
    pk_column: str,
    min_val: int,
    max_val: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> SnapshotPlan:
    """Fixed-width ranges over [min, max] of an integer PK.

    Mirrors `buildIntegerRangeQuery` (coordinator.go:505-523): chunk i covers
    ``pk >= lo AND pk <= lo+size-1``; the last chunk's upper bound is clamped
    to max. Empty ranges are kept (they cost one empty task) — same as the
    reference, which plans purely from MIN/MAX without a density scan.
    """
    if max_val < min_val:
        return SnapshotPlan(Strategy.INTEGER_RANGE, [], pk_column, chunk_size)
    n = math.ceil((max_val - min_val + 1) / chunk_size)
    chunks = []
    for i in range(n):
        lo = min_val + i * chunk_size
        hi = min(lo + chunk_size - 1, max_val)
        chunks.append(
            Chunk(
                index=i,
                where=f"{pk_column} >= {lo} AND {pk_column} <= {hi}",
                range_start=lo,
                range_end=hi,
            )
        )
    return SnapshotPlan(Strategy.INTEGER_RANGE, chunks, pk_column, chunk_size)


def plan_ctid_blocks(
    relpages: int,
    reltuples: float,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> SnapshotPlan:
    """Physical-block chunking for tables without an integer PK.

    Mirrors `createCTIDBlockChunksWithConn` + `estimateRowsPerBlockWithConn`
    (coordinator.go:797-920): rows/block ≈ reltuples/relpages (min 1), blocks
    per chunk = chunk_size / rows_per_block (min 1); the LAST chunk is
    unbounded above (``ctid >= '(b,0)'``) so rows appended to new blocks
    after planning are still captured — the reference's late-row guard.
    """
    if relpages <= 0:
        return SnapshotPlan(
            Strategy.CTID_BLOCK,
            [Chunk(index=0, where="ctid >= '(0,0)'::tid", block_start=0, block_end=None)],
            None,
            chunk_size,
        )
    rows_per_block = max(1.0, reltuples / relpages) if reltuples > 0 else 1.0
    blocks_per_chunk = max(1, int(chunk_size / rows_per_block))
    chunks = []
    start = 0
    i = 0
    while start < relpages:
        end = start + blocks_per_chunk
        last = end >= relpages
        if last:
            where = f"ctid >= '({start},0)'::tid"
            chunks.append(Chunk(index=i, where=where, block_start=start, block_end=None))
        else:
            where = f"ctid >= '({start},0)'::tid AND ctid < '({end},0)'::tid"
            chunks.append(Chunk(index=i, where=where, block_start=start, block_end=end))
        start = end
        i += 1
    return SnapshotPlan(Strategy.CTID_BLOCK, chunks, None, chunk_size)


def plan_offset(
    total_rows: int,
    order_by: str,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> SnapshotPlan:
    """COUNT(*)-driven LIMIT/OFFSET chunks — the reference's slow fallback
    (`createOffsetChunksWithConn`, coordinator.go:922-969). The predicate is
    a subquery marker; the JDBC layer renders it as an ORDER BY … LIMIT …
    OFFSET … dbtable subquery per partition."""
    n = max(1, math.ceil(total_rows / chunk_size))
    chunks = [
        Chunk(
            index=i,
            where=f"__offset_chunk__ ORDER BY {order_by} LIMIT {chunk_size} OFFSET {i * chunk_size}",
            limit=chunk_size,
            offset=i * chunk_size,
        )
        for i in range(n)
    ]
    return SnapshotPlan(Strategy.OFFSET, chunks, None, chunk_size)


def plan_auto(
    *,
    integer_pk: str | None,
    min_val: int | None = None,
    max_val: int | None = None,
    relpages: int | None = None,
    reltuples: float | None = None,
    total_rows: int | None = None,
    order_by: str = "ctid",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> SnapshotPlan:
    """Strategy auto-detection (O13, `createChunksAutoDetectConn`,
    coordinator.go:646-729): integer PK → range; else ctid stats → block;
    else offset."""
    if integer_pk is not None and min_val is not None and max_val is not None:
        return plan_integer_range(integer_pk, min_val, max_val, chunk_size)
    if relpages is not None:
        return plan_ctid_blocks(relpages, reltuples or 0.0, chunk_size)
    if total_rows is not None:
        return plan_offset(total_rows, order_by, chunk_size)
    raise ValueError("insufficient stats for snapshot planning")


def snapshot_with_chunks(
    df: DataFrame, plan: SnapshotPlan, pk_column: str | None = None
) -> DataFrame:
    """Tag each row of a captured table with its planner chunk id — the
    parquet-transport verification path for the integer-range planner
    (SURVEY.md §7: 'the planner must abstract partition spec from
    transport')."""
    col = pk_column or plan.pk_column
    if col is None:
        raise ValueError("integer-range verification needs a pk column")
    return df.withColumn("chunk_id", plan.chunk_id_expr(col))

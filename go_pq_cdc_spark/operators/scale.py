"""Scale techniques as reusable operators: bucketed co-located joins,
salted skew aggregation, at-least-once stream dedup.

These are the knobs SURVEY §4 and the 100 TB design notes call for:
bucketing removes the shuffle from repeated big-big joins; salting breaks
hot keys across reducers; dropDuplicatesWithinWatermark absorbs transport
retries before the mirror merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def spread_small_input(df: DataFrame, *keys) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    session's default parallelism.

    Why conditional (r4 verdict): several operators repartitioned their
    input unconditionally so a small local table (one parquet row-group)
    would still evaluate expensive interpreted HOF projections on every
    core. At 100 TB the scan already has thousands of splits, and an
    unconditional `repartition()` is a full shuffle of the dataset bought
    for nothing. This helper keeps the local-parallelism benefit and makes
    the at-scale path a structural no-op: no Exchange is injected when the
    input is already wide (plan-gated in tests/test_plans_explain.py).

    `df.rdd.getNumPartitions()` materializes the physical plan but does
    not launch a job.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *keys)


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, n_buckets: int = 32
) -> None:
    """Persist as a bucketed table: later equi-joins/aggregations on
    `bucket_col` between tables bucketed the same way run shuffle-free
    (SortMergeJoin reads co-located buckets directly)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def salted_agg_counts(
    df: DataFrame, key_col: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial count on
    (key, salt) — spreading one hot key over `salt_buckets` reducers —
    then final combine on key. Result identical to a plain groupBy count;
    the shuffle profile is what changes.

    The salt is DETERMINISTIC (hash of the full row): a nondeterministic
    salt (rand/monotonically_increasing_id) as a shuffle key re-salts rows
    when a failed map task is recomputed, double-counting or losing rows.
    Hashing all columns still spreads a hot key because its rows differ in
    the non-key attributes."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int")
    )
    partial = salted.groupBy(key_col, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(key_col).agg(F.sum("_pc").cast("long").alias("n"))


def dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "commit_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Absorb at-least-once transport duplicates (same lsn re-delivered
    after a retry) before the mirror merge. State is bounded by the
    watermark horizon."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def write_range_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 32,
) -> None:
    """Persist parquet RANGE-CLUSTERED on `cluster_cols`: a range
    repartition (sampled global ordering, no single-task sort) followed by
    a sort WITHIN each partition. Every output file then covers a narrow,
    non-overlapping slice of the cluster key, so its parquet footer
    min/max statistics become selective: a later filter on the key reads
    only the files whose range intersects — file-level data skipping on
    top of row-group pruning. This is the layout play for the 100 TB
    mirror/corpus: one reorganizing shuffle at write time buys every
    subsequent point/range query a near-pruned scan (the same economics as
    Delta/Iceberg OPTIMIZE ZORDER, single-dimension case).

    Skipping happens at two levels on read: Spark pushes the predicate to
    parquet (row-group stats), and for partition-count purposes AQE sees
    tiny post-filter tasks. `tests/test_scale_ops.py` proves the layout
    behaviorally: a key-range query over the clustered layout touches
    strictly fewer FILES than over a hash-scattered layout of the same
    data, with identical results."""
    cols = [F.col(c) for c in cluster_cols]
    # repartitionByRange's sampled (per-execution-random) boundaries are
    # SAFE here, unlike in the prefix sum (training.with_prefix_offsets):
    # the exchange has exactly ONE consumer (the write), so there is no
    # second execution to misalign with — boundaries only shape the file
    # layout, never a value.
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def salted_topk(
    df: DataFrame,
    order_cols: list,
    rank_name: str,
    k: int,
    salt_col: str | Column,
    partition_cols: tuple[str, ...] = (),
    salts: int = 32,
) -> DataFrame:
    """TWO-LEVEL top-k per partition group (or globally when
    `partition_cols` is empty): a salted partial top-k — a window over
    (*partition_cols, pmod(xxhash64(salt_col), salts)) so `salts`
    reducers share each group's rows — then the final ranked top-k over
    at most salts*k survivors per group.

    This is THE top-k shape for unbounded inputs: a single
    `Window.partitionBy(group)` (or a global window) funnels EVERY row of
    a group through ONE reducer task — at 100 TB that task is the job.
    The result is provably identical to the one-level window (every
    member of the global top-k ranks <= k within its salt; the final
    window re-ranks the union under the same ordering), so oracles can
    keep one-level formulations. Ties must be broken by a unique column
    inside `order_cols`. Same pattern as `sketch._bottom_k` (the KMV
    aggregation-based variant)."""
    w1 = Window.partitionBy(*partition_cols, "_salt").orderBy(*order_cols)
    pre = (
        df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(F.col(salt_col) if isinstance(salt_col, str) else salt_col),
                   F.lit(salts)).cast("int"),
        )
        .withColumn("_rn1", F.row_number().over(w1))
        .filter(F.col("_rn1") <= k)
        .drop("_salt", "_rn1")
    )
    w2 = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return pre.withColumn(rank_name, F.row_number().over(w2).cast("long")).filter(
        F.col(rank_name) <= k
    )


def explosive_join_parts(df: DataFrame) -> int:
    """Partition width for the AQE-EXEMPT keyed repartition that guards
    output-explosive self-joins (the r8 funnel lesson: AQE coalesces by
    the join's byte-tiny INPUT while the OUTPUT is the explosion).

    One knob for every such site (optimization r13). Width =
    defaultParallelism — the scale-adaptive quantity (local core count
    here, cluster total cores via spark-submit there). The former 2x
    headroom bought nothing at either scale while doubling the
    per-task fixed overhead of every stage riding the exchange
    (measured at sf0.1: the minhash band pipeline alone dropped
    2.0 s -> 1.2 s at 1x)."""
    return df.sparkSession.sparkContext.defaultParallelism


def grid_self_join_sides(
    df: DataFrame,
    id_col: str = "id",
    grid: int = 16,
    extra_keys: tuple[str, ...] = (),
    parts: int | None = None,
):
    """Sides + join conditions for a GRID-PARTITIONED all-pairs self-join.

    A ground-truth pairwise operator blocked by a LOW-cardinality key
    (lang ~5 values, label ~10) degenerates under a plain self-equi-join:
    the join hashes each block's whole pair set into ONE task, so the
    biggest block IS the job (r8 sf1 sweep: one 35-minute task inside
    dedup_ngram_jaccard). Gridding restores parallelism: each row gets a
    deterministic coordinate g = xxhash64(id) % grid; side a fixes
    _ga=g(a) and explodes _gb over all cells, side b fixes _gb=g(b) and
    explodes _ga — every unordered pair meets in exactly ONE of grid²
    cells (the counterpart axis comes only from the explosion), so no
    post-join dedup is needed and the largest task holds ~|block|²/grid²
    pairs. Each side is replicated grid× — the standard
    space-for-parallelism trade of a blocked cartesian. Callers AND any
    block-equality conditions compose on top of the returned conds; pass
    the block columns as `extra_keys` so they join the partitioning.
    Output set is identical to the naive `a.id < b.id` self-join.

    Both sides are EXPLICITLY repartitioned on the full join key with a
    user-specified partition count: AQE sizes shuffle coalescing by the
    join's INPUT bytes, which are tiny here while the OUTPUT is the pair
    explosion — left to itself it coalesces the whole join into one or
    two tasks and the funnel returns through the back door (observed at
    sf1: 1.3 of 28 cores busy). A user-numbered repartition is exempt
    from AQE coalescing, and since it hashes exactly the join keys the
    sort-merge join reuses the exchange instead of adding another."""
    if parts is None:
        parts = explosive_join_parts(df)
    g = F.pmod(F.xxhash64(F.col(id_col)), F.lit(grid)).cast("int")
    cells = F.array(*[F.lit(i) for i in range(grid)])
    keys = [*extra_keys, "_ga", "_gb"]
    a = df.withColumn("_ga", g).withColumn("_gb", F.explode(cells))
    b = df.withColumn("_gb", g).withColumn("_ga", F.explode(cells))
    a = a.repartition(parts, *keys)
    b = b.repartition(parts, *keys)
    conds = [
        F.col("a._ga") == F.col("b._ga"),
        F.col("a._gb") == F.col("b._gb"),
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
    ]
    return a, b, conds

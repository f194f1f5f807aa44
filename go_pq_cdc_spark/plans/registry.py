"""Query registry — the contract between the engine and the correctness gate.

Every operator the engine claims (SURVEY.md §2) registers here as a
``QuerySpec``: a Spark plan builder ``(spark, sf_dir) -> DataFrame`` and,
where ANSI-SQL-expressible, the equivalent DuckDB oracle SQL over the same
parquet tables. The driver hash-compares the two at sf0.01.

Determinism rules (both sides MUST follow, or hashes diverge):
  * Alias every computed column identically in Spark and SQL.
  * Aggregate floating columns via exact arithmetic: cast each value to
    DECIMAL before SUM (order-independent), cast the final sum to DOUBLE.
    Never hash a raw SUM(double).
  * In DuckDB oracles the final cast is `CAST(CAST(sum AS VARCHAR) AS
    DOUBLE)` — the VARCHAR bridge. DuckDB's direct DECIMAL->DOUBLE cast
    converts the int128 unscaled value then divides by the scale power:
    two roundings, off by an ulp once the unscaled value exceeds 2^53
    (found by the r8 sf1 sweep on q1's sum_charge: Spark/BigDecimal
    27864155010.94159 vs DuckDB ...941593). decimal->varchar is exact
    text and varchar->double is one correctly-rounded strtod, matching
    Spark's correctly-rounded BigDecimal.doubleValue at ANY scale.
  * AVG = CAST(exact decimal sum AS DOUBLE) / count — one IEEE division,
    identical on both engines.
  * Timestamps leave as epoch micros (Spark unix_micros / DuckDB epoch_us)
    or DATE — never engine-formatted strings.
  * Rank/top-k ties broken by a unique key column.

Builders must be SESSION-STATE-PURE: no `spark.conf` mutation, no temp
views or UDF registrations left behind. The driver runs every builder
back-to-back in one session, and the plan lint plans them concurrently
from one SparkContext (each worker in its own `newSession()`), so leaked
session state is either cross-query contamination or a lint race. A
builder needing a view/conf must scope it to a `newSession()` of its own.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark_fn: SparkFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    *,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[SparkFn], SparkFn]:
    def deco(fn: SparkFn) -> SparkFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            spark_fn=fn,
            oracle=oracle,
            doc=(fn.__doc__ or "").strip(),
            tags=tags,
            bench=bench,
        )
        return fn

    return deco


def all_queries() -> dict[str, SparkFn]:
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


def fold_id_batches(
    df: DataFrame,
    id_col: str,
    update,
    read_final,
    prefix: str = "stream_gate_",
) -> DataFrame:
    """Shared scaffold for driving a streaming foreachBatch machine under
    the driver's oracle over a BATCH corpus (r12 review: the id-keyed
    sibling of plans/cdc._fold_lsn_batches, extracted from its 4th/5th
    copies): the corpus splits into three id-ordered micro-batches by
    span tertiles, each fed to `update(batch_df, batch_id, root)` where
    `root` is a throwaway temp dir the machine keeps its index/pairs
    under; `read_final(spark, root)` builds the result, MATERIALIZED
    (localCheckpoint) before the finally removes the dir — a failing
    fold can't leak it. read_final must read with DECLARED schemas: a
    zero-pair corpus leaves dirs with no parquet files, and schema
    inference would crash a legitimately-empty result."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    spark = df.sparkSession
    lo, hi = df.agg(F.min(id_col), F.max(id_col)).collect()[0]
    if lo is None:
        # empty corpus: min/max aggregate to NULL (a bare int(None) here
        # was a confusing TypeError — r12 advisor). Zero batches to fold;
        # the machine's final read over an empty root IS the answer.
        root = tempfile.mkdtemp(prefix=prefix)
        try:
            return read_final(spark, root).localCheckpoint(eager=True)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    span = int(hi) - int(lo) + 1
    root = tempfile.mkdtemp(prefix=prefix)
    try:
        prev = int(lo) - 1
        for i, cut in enumerate(
            (int(lo) + span // 3, int(lo) + span * 2 // 3, int(hi))
        ):
            batch = df.filter(
                (F.col(id_col) > prev) & (F.col(id_col) <= cut)
            )
            update(batch, i, root)
            prev = cut
        return read_final(spark, root).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)

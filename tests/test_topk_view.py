"""Incremental top-k-per-group view: the bounded synopsis must equal a
from-scratch top-k after EVERY batch, across insert floods, mass deletes,
value-preserving updates, and tie churn."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from go_pq_cdc_spark.streaming.topk_view_stream import (    read_topk_view,
    update_topk_view_state,
)


# slow tier (r13 verdict item 1): excluded from the default pytest run
# so the driver's gate finishes inside its window; run with
# `pytest -m "slow or not slow"` (full) or `-m slow` (this tier only).
pytestmark = pytest.mark.slow


_BATCH_SCHEMA = "pk long, op string, before_val double, after_val double"


def _grp(cents: int) -> int:
    return (cents // 100) % 8


def _live_df(spark, live: dict):
    rows = [(_grp(c), pk, c) for pk, c in live.items()]
    return spark.createDataFrame(rows, "grp long, pk long, v_cents long")


def _want(live: dict, k: int):
    by_g: dict = {}
    for pk, c in live.items():
        by_g.setdefault(_grp(c), []).append((c, pk))
    out = {}
    for g, pairs in by_g.items():
        for i, (c, pk) in enumerate(sorted(pairs, reverse=True)[:k]):
            out[(g, i + 1)] = (pk, c / 100)
    return out


def _got(spark, state_dir):
    return {
        (r["grp"], r["rnk"]): (r["pk"], r["val"])
        for r in read_topk_view(spark, state_dir).collect()
    }


def _got_arrow(state_dir):
    """read_topk_view's result computed without a Spark job (pyarrow over
    the committed version) — cheap enough to assert after EVERY batch of
    the random-history proof. Spark-job-per-batch reads were the r10
    suite's cost; dropping to every-other-batch checks was the first cut,
    but the dirty-REPAIR path can overwrite a corrupted group from the
    authoritative source between checks and mask the corruption (r11
    review) — so the per-batch eye is back, just off the JVM."""
    import pyarrow.parquet as pq

    from go_pq_cdc_spark.streaming.versioned_state import VersionedState

    vs = VersionedState(state_dir)
    ver = vs.latest_version()
    k = int(vs.read_meta(ver)["k"])
    t = pq.read_table(vs.version_dir(ver)).to_pylist()
    return {
        (r["grp"], r["rnk"]): (r["pk"], r["v_cents"] / 100)
        for r in t
        if r["rnk"] <= k
    }


def test_topk_random_history_matches_from_scratch(spark, tmp_path):
    rng = random.Random(7)
    state_dir = str(tmp_path / "topk")
    live: dict[int, int] = {}
    next_pk = 0
    for batch_id in range(10):
        rows = []
        for _ in range(30):
            choice = rng.random()
            # small value domain -> frequent ties and group collisions
            cents = rng.randrange(0, 1600, 25)
            if choice < 0.45 or not live:
                next_pk += 1
                rows.append((next_pk, "I", None, cents / 100))
                live[next_pk] = cents
            elif choice < 0.75:
                pk = rng.choice(list(live))
                # occasionally a value-preserving update (same cents)
                if rng.random() < 0.2:
                    cents = live[pk]
                rows.append((pk, "U", live[pk] / 100, cents / 100))
                live[pk] = cents
            else:
                pk = rng.choice(list(live))
                rows.append((pk, "D", live[pk] / 100, None))
                del live[pk]
        update_topk_view_state(
            spark.createDataFrame(rows, _BATCH_SCHEMA),
            batch_id,
            state_dir,
            authoritative=lambda: _live_df(spark, live),
            k=3,
        )
        # per-batch from-scratch comparison, off-JVM (pyarrow) so it
        # costs ~ms instead of a Spark job — full detection power (the
        # repair path can heal drift between sparser checks) without the
        # read cost that made this the suite's slowest test
        assert _got_arrow(state_dir) == _want(live, 3), (
            f"diverged at batch {batch_id}"
        )
    # the Spark read path (cents->double cast chain) once, at the end
    assert _got(spark, state_dir) == _want(live, 3)


def test_topk_insert_flood_and_mass_delete(spark, tmp_path):
    """Both overflow arms: one batch inserting far more than capacity
    into one group (uncaptured-insert truncation), then one batch
    deleting the entire top (uncaptured-retraction dirty + repair)."""
    state_dir = str(tmp_path / "topk")
    k = 3  # capacity 6
    # 30 keys, all group 1 (values 9xx: floor 9 % 8 = 1)
    live = {pk: 900 + pk for pk in range(1, 31)}
    rows = [(pk, "I", None, c / 100) for pk, c in live.items()]
    update_topk_view_state(
        spark.createDataFrame(rows, _BATCH_SCHEMA), 0, state_dir,
        authoritative=lambda: _live_df(spark, live), k=k,
    )
    assert _got(spark, state_dir) == _want(live, k)
    # delete the 10 highest in one batch (far beyond capacity+1)
    rows = []
    for pk in range(21, 31):
        rows.append((pk, "D", live[pk] / 100, None))
        del live[pk]
    update_topk_view_state(
        spark.createDataFrame(rows, _BATCH_SCHEMA), 1, state_dir,
        authoritative=lambda: _live_df(spark, live), k=k,
    )
    assert _got(spark, state_dir) == _want(live, k)
    # churn: delete + reinsert the same (value, pk) in one batch
    rows = [
        (20, "D", live[20] / 100, None),
        (20, "I", None, live[20] / 100),
        (19, "U", live[19] / 100, live[19] / 100),  # value-preserving U
    ]
    update_topk_view_state(
        spark.createDataFrame(rows, _BATCH_SCHEMA), 2, state_dir,
        authoritative=lambda: _live_df(spark, live), k=k,
    )
    assert _got(spark, state_dir) == _want(live, k)


def test_topk_cancellation_must_not_erase_overflow_proofs(spark, tmp_path):
    """r10 review repro (both bugs, k=1 so capacity=2, capture cap=3):
    same-pair I..D churn of three high keys fills every capture slot and
    nets to nothing — the overflow proofs must anchor on the RAW capture
    (which bounds the uncaptured pairs), not the netted lists.

    Arm A: an additional UNCAPTURED genuine delete of the stored top —
    the group must go dirty and repair (netted retractions are empty).
    Arm B: an additional UNCAPTURED genuine insert above the stored
    prefix minimum — the truncation must still fire (netted inserts are
    empty) and the repair must surface the new maximum."""
    churn = []
    for i, cents in enumerate((56, 64, 72)):
        pk = 100 + i
        churn.append((pk, "I", None, cents / 100))
        churn.append((pk, "D", cents / 100, None))

    for arm, extra, live_after in (
        ("delete", [(6, "D", 0.48, None)],
         {pk: 8 * pk for pk in range(1, 6)}),
        ("insert", [(200, "I", None, 0.49)],
         {**{pk: 8 * pk for pk in range(1, 7)}, 200: 49}),
    ):
        state_dir = str(tmp_path / f"topk_{arm}")
        live = {pk: 8 * pk for pk in range(1, 7)}  # 8..48 cents, one grp
        rows = [(pk, "I", None, c / 100) for pk, c in live.items()]
        update_topk_view_state(
            spark.createDataFrame(rows, _BATCH_SCHEMA), 0, state_dir,
            authoritative=lambda: _live_df(spark, live), k=1,
        )
        live = live_after
        update_topk_view_state(
            spark.createDataFrame(churn + extra, _BATCH_SCHEMA), 1, state_dir,
            authoritative=lambda: _live_df(spark, live), k=1,
        )
        assert _got(spark, state_dir) == _want(live, 1), arm


def test_topk_group_ceiling_refusal(spark, tmp_path):
    """r11 verdict item 4: a view keyed on a high-cardinality column must
    REFUSE instead of silently collecting unbounded groups x capacity
    state to the driver — in the same batch, and as state grows across
    batches."""
    state_dir = str(tmp_path / "topk")
    # n_groups=1000 makes each integer value its own group
    live = {pk: pk * 100 for pk in range(1, 9)}  # 8 distinct groups
    auth = lambda: _live_df(spark, live)  # noqa: E731
    rows = [(pk, "I", None, float(pk)) for pk in range(1, 9)]
    with pytest.raises(ValueError, match="max_groups"):
        update_topk_view_state(
            spark.createDataFrame(rows, _BATCH_SCHEMA), 0, str(tmp_path / "a"),
            authoritative=auth, k=1, n_groups=1000, max_groups=4,
        )
    # under the ceiling per batch, but cumulative growth still refuses
    b0 = [(pk, "I", None, float(pk)) for pk in range(1, 4)]  # 3 groups
    update_topk_view_state(
        spark.createDataFrame(b0, _BATCH_SCHEMA), 0, state_dir,
        authoritative=lambda: _live_df(spark, {pk: pk * 100 for pk in range(1, 4)}),
        k=1, n_groups=1000, max_groups=4,
    )
    b1 = [(pk, "I", None, float(pk)) for pk in range(4, 7)]  # 3 more
    with pytest.raises(ValueError, match="max_groups"):
        update_topk_view_state(
            spark.createDataFrame(b1, _BATCH_SCHEMA), 1, state_dir,
            authoritative=auth, k=1, n_groups=1000, max_groups=4,
        )
    # the committed meta records the tracked-group count, so re-opening
    # oversized state under a smaller ceiling refuses BEFORE the collect
    ok = [(pk, "I", None, float(pk)) for pk in range(4, 5)]
    update_topk_view_state(
        spark.createDataFrame(ok, _BATCH_SCHEMA), 1, state_dir,
        authoritative=lambda: _live_df(spark, {pk: pk * 100 for pk in range(1, 5)}),
        k=1, n_groups=1000, max_groups=4,
    )
    with pytest.raises(ValueError, match="max_groups"):
        update_topk_view_state(
            spark.createDataFrame(ok, _BATCH_SCHEMA), 2, state_dir,
            authoritative=auth, k=1, n_groups=1000, max_groups=2,
        )


def test_topk_rejects_k_change(spark, tmp_path):
    state_dir = str(tmp_path / "topk")
    df = spark.createDataFrame([(1, "I", None, 5.0)], _BATCH_SCHEMA)
    auth = lambda: _live_df(spark, {1: 500})  # noqa: E731
    update_topk_view_state(df, 0, state_dir, authoritative=auth, k=3)
    with pytest.raises(ValueError, match="k="):
        update_topk_view_state(df, 1, state_dir, authoritative=auth, k=5)

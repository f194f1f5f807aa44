"""Streaming-layer tests: file-transport change stream -> stateful txn
buffering and mirror maintenance, driven synchronously with
processAllAvailable() (the reference's integration scenarios, SURVEY.md §5,
minus the real Postgres)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from go_pq_cdc_spark.streaming import (
    buffer_streamed_txns,
    changelog_stream,
    merge_mirror_batch,
    mirror_sink,
    read_mirror,
)
from go_pq_cdc_spark.streaming.changelog_stream import FLAT_CHANGE_SCHEMA

import datetime

# slow tier (r13 verdict item 1): excluded from the default pytest run
# so the driver's gate finishes inside its window; run with
# `pytest -m "slow or not slow"` (full) or `-m slow` (this tier only).
pytestmark = pytest.mark.slow


def _ev(op, lsn, xid, pk, val):
    return Row(
        op=op,
        lsn=lsn,
        xid=xid,
        commit_ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=lsn),
        pk=pk,
        after_val=val,
    )


@pytest.fixture()
def tmpdirs():
    base = tempfile.mkdtemp(prefix="gpcs_stream_")
    yield {
        "in": os.path.join(base, "in"),
        "state": os.path.join(base, "state"),
        "ckpt": os.path.join(base, "ckpt"),
        "ckpt2": os.path.join(base, "ckpt2"),
    }
    shutil.rmtree(base, ignore_errors=True)


def _write_batch(spark, path, rows, batch_id):
    df = spark.createDataFrame(rows, FLAT_CHANGE_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, f"b{batch_id}"))


def test_mirror_sink_latest_state(spark, tmpdirs):
    """basic_functionality_test.go roundtrip: insert/update/delete stream
    maintained as a queryable mirror with max-LSN-wins."""
    os.makedirs(tmpdirs["in"], exist_ok=True)
    _write_batch(
        spark,
        tmpdirs["in"],
        [_ev("I", 1, 10, 1, 1.0), _ev("I", 2, 10, 2, 2.0), _ev("U", 3, 11, 1, 1.5)],
        0,
    )
    stream = changelog_stream(spark, tmpdirs["in"] + "/*")
    q = mirror_sink(stream, tmpdirs["state"], tmpdirs["ckpt"])
    try:
        q.processAllAvailable()
        state = {
            r["pk"]: r["after_val"]
            for r in read_mirror(spark, tmpdirs["state"]).collect()
        }
        assert state == {1: 1.5, 2: 2.0}

        _write_batch(
            spark, tmpdirs["in"], [_ev("D", 4, 12, 2, None), _ev("I", 5, 12, 3, 3.0)], 1
        )
        q.processAllAvailable()
        state = {
            r["pk"]: r["after_val"]
            for r in read_mirror(spark, tmpdirs["state"]).collect()
        }
        assert state == {1: 1.5, 3: 3.0}
    finally:
        q.stop()


def test_mirror_merge_idempotent(spark, tmpdirs):
    """At-least-once delivery: replaying the same batch must not change the
    mirror (idempotent MERGE => effectively-once)."""
    rows = [_ev("I", 1, 10, 1, 1.0), _ev("U", 2, 10, 1, 2.0)]
    batch = spark.createDataFrame(rows, FLAT_CHANGE_SCHEMA)
    os.makedirs(tmpdirs["state"], exist_ok=True)
    merge_mirror_batch(batch, tmpdirs["state"])
    first = sorted(
        read_mirror(spark, tmpdirs["state"]).collect()
    )
    merge_mirror_batch(batch, tmpdirs["state"])
    second = sorted(
        read_mirror(spark, tmpdirs["state"]).collect()
    )
    assert first == second


def test_streamed_txn_commit_and_abort(spark, tmpdirs):
    """streaming_transaction_test.go + streaming_rollback_test.go: events
    surface only after their txn's commit marker, in LSN order, stamped
    with the commit LSN; aborted txns deliver nothing."""
    os.makedirs(tmpdirs["in"], exist_ok=True)
    # Batch 0: xid 100 starts (2 events, no commit); xid 200 starts.
    _write_batch(
        spark,
        tmpdirs["in"],
        [_ev("I", 10, 100, 1, 1.0), _ev("U", 12, 100, 1, 1.1), _ev("I", 11, 200, 9, 9.0)],
        0,
    )
    stream = changelog_stream(spark, tmpdirs["in"] + "/*")
    out = buffer_streamed_txns(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("txn_out")
        .option("checkpointLocation", tmpdirs["ckpt2"])
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM txn_out").count() == 0  # nothing committed yet

        # Batch 1: xid 100 commits (commit LSN 20); xid 200 aborts.
        _write_batch(
            spark,
            tmpdirs["in"],
            [_ev("C", 20, 100, 0, None), _ev("A", 21, 200, 0, None)],
            1,
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM txn_out ORDER BY lsn").collect()
        assert [(r["xid"], r["lsn"], r["commit_lsn"]) for r in rows] == [
            (100, 10, 20),
            (100, 12, 20),
        ]
        assert not [r for r in rows if r["xid"] == 200], "aborted txn leaked"
    finally:
        q.stop()


def test_windowed_agg_with_watermark(spark, tmpdirs):
    """Streaming windows + watermark over commit_ts (SURVEY §2.2 streaming
    rows): tumbling 10s counts per op."""
    os.makedirs(tmpdirs["in"], exist_ok=True)
    _write_batch(
        spark,
        tmpdirs["in"],
        [_ev("I", i, 1, i, float(i)) for i in range(25)],
        0,
    )
    stream = changelog_stream(spark, tmpdirs["in"] + "/*")
    agg = (
        stream.withWatermark("commit_ts", "30 seconds")
        .groupBy(F.window("commit_ts", "10 seconds"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT n FROM win_out").collect()
        assert sum(r["n"] for r in rows) == 25
        assert len(rows) == 3  # lsn 0..24 -> 3 tumbling windows
    finally:
        q.stop()


def test_mirror_replay_with_toast_null(spark, tmpdirs):
    """At-least-once replay edge: the replayed event has the same LSN as
    the stored mirror row but a NULL (TOAST-unchanged) value — the stored
    repaired value must win deterministically."""
    os.makedirs(tmpdirs["state"], exist_ok=True)
    b1 = spark.createDataFrame(
        [_ev("I", 1, 1, 7, 42.0), _ev("U", 2, 1, 7, None)], FLAT_CHANGE_SCHEMA
    )
    merge_mirror_batch(b1, tmpdirs["state"])
    cur = read_mirror(spark, tmpdirs["state"]).collect()
    assert [(r["pk"], r["after_val"], r["lsn"]) for r in cur] == [(7, 42.0, 2)]

    # replay just the TOAST-null update (same lsn as the stored row)
    b2 = spark.createDataFrame([_ev("U", 2, 1, 7, None)], FLAT_CHANGE_SCHEMA)
    merge_mirror_batch(b2, tmpdirs["state"])
    cur = read_mirror(spark, tmpdirs["state"]).collect()
    assert [(r["pk"], r["after_val"], r["lsn"]) for r in cur] == [(7, 42.0, 2)]


@pytest.mark.parametrize("n_buckets", [None, 256])
def test_mirror_merge_rewrites_only_touched_buckets(spark, tmpdirs, n_buckets):
    """The scale gate: a micro-batch must rewrite ONLY the pk-buckets its
    keys hash into — per-batch IO scales with batch size, not state size
    (r2 verdict scale-killer #1: the old merge rewrote the entire mirror
    every batch). Parameterized over the configurable bucket count."""
    import json as _json

    os.makedirs(tmpdirs["state"], exist_ok=True)
    big = spark.createDataFrame(
        [_ev("I", pk, 1, pk, float(pk)) for pk in range(1, 201)], FLAT_CHANGE_SCHEMA
    )
    merge_mirror_batch(big, tmpdirs["state"], n_buckets=n_buckets)
    with open(os.path.join(tmpdirs["state"], "manifest.json")) as f:
        before = _json.load(f)["buckets"]

    one = spark.createDataFrame([_ev("U", 1000, 2, 7, 7.5)], FLAT_CHANGE_SCHEMA)
    merge_mirror_batch(one, tmpdirs["state"])
    with open(os.path.join(tmpdirs["state"], "manifest.json")) as f:
        after = _json.load(f)["buckets"]

    changed = {b for b in set(before) | set(after) if before.get(b) != after.get(b)}
    assert len(changed) == 1, f"single-key batch must touch 1 bucket, got {changed}"
    # untouched buckets keep pointing at the SAME files (no rewrite)
    for b in set(before) - changed:
        assert after[b] == before[b]
    # and the merged value is correct
    state = {r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()}
    assert state[7] == 7.5 and state[8] == 8.0 and len(state) == 200


def test_mirror_bucket_count_equivalence_and_pinning(spark, tmpdirs):
    """VERDICT r3 item 6: a 64-bucket mirror must hold exactly the same
    latest_state as the default 32-bucket mirror over the same change
    stream, the chosen count is pinned in the manifest, and a conflicting
    re-bucket request is refused (silent re-hash would corrupt the
    touched-bucket invariant)."""
    import json as _json

    from go_pq_cdc_spark.streaming.changelog_stream import suggest_mirror_buckets

    # 64, not 256: the invariant (same state under ANY pinned pow-2
    # count) is count-magnitude-independent, and the 256-way partitioned
    # writes x3 batches made this the suite's slowest test at identical
    # coverage (r10 verdict item 8)
    batches = [
        [_ev("I", pk, 1, pk, float(pk)) for pk in range(1, 101)],
        [_ev("U", 200 + pk, 2, pk, pk * 10.0) for pk in range(1, 50, 3)],
        [_ev("D", 400 + pk, 3, pk, None) for pk in range(2, 30, 5)],
    ]
    s32 = os.path.join(tmpdirs["state"], "m32")
    s64 = os.path.join(tmpdirs["state"], "m64")
    os.makedirs(s32), os.makedirs(s64)
    for rows in batches:
        df = spark.createDataFrame(rows, FLAT_CHANGE_SCHEMA)
        merge_mirror_batch(df, s32)
        merge_mirror_batch(df, s64, n_buckets=64)

    as_map = lambda d: {
        r["pk"]: (r["lsn"], r["after_val"]) for r in read_mirror(spark, d).collect()
    }
    assert as_map(s32) == as_map(s64)

    with open(os.path.join(s64, "manifest.json")) as f:
        assert _json.load(f)["n_buckets"] == 64
    with pytest.raises(ValueError, match="rebucket_mirror"):
        merge_mirror_batch(
            spark.createDataFrame([_ev("I", 999, 9, 999, 1.0)], FLAT_CHANGE_SCHEMA),
            s64,
            n_buckets=128,
        )

    # sizing rule: buckets ~ state_size / target_rewrite_size, pow2-rounded
    assert suggest_mirror_buckets(0) == 32
    assert suggest_mirror_buckets(10 << 40, 512 << 20) == 32768


def test_lookup_mirror_prunes_to_hashed_buckets(spark, tmpdirs):
    """Read-side counterpart of the touched-buckets write gate: a point
    lookup must return exactly the filtered full-read rows while reading
    ONLY the bucket files its keys hash into — point-query IO is
    ~len(pks)/n_buckets of the state, independent of mirror size."""
    from go_pq_cdc_spark.streaming.changelog_stream import lookup_mirror

    os.makedirs(tmpdirs["state"], exist_ok=True)
    big = spark.createDataFrame(
        [_ev("I", pk, 1, pk, float(pk)) for pk in range(1, 201)], FLAT_CHANGE_SCHEMA
    )
    merge_mirror_batch(big, tmpdirs["state"])

    got = lookup_mirror(spark, tmpdirs["state"], [7, 8])
    rows = {(r["pk"], r["after_val"]) for r in got.collect()}
    assert rows == {(7, 7.0), (8, 8.0)}

    full_files = set(read_mirror(spark, tmpdirs["state"]).inputFiles())
    lookup_files = set(got.inputFiles())
    assert lookup_files and lookup_files < full_files  # strictly pruned
    assert len(lookup_files) <= 2 * max(
        1, len(full_files) // 16
    )  # ~2 buckets of 32, not the table

    # empty key set and missing keys degrade cleanly
    assert lookup_mirror(spark, tmpdirs["state"], []).count() == 0
    assert lookup_mirror(spark, tmpdirs["state"], [10_000]).count() == 0


def test_register_view_resolves_in_sql(spark, tmpdirs):
    """SURVEY §7 catalog nice-to-have: the mirror is queryable through
    spark.sql by name, reflecting the state at registration."""
    from go_pq_cdc_spark.config import EngineConfig
    from go_pq_cdc_spark.engine import CdcEngine

    os.makedirs(tmpdirs["state"], exist_ok=True)
    merge_mirror_batch(
        spark.createDataFrame(
            [_ev("I", 1, 1, 1, 1.0), _ev("I", 2, 1, 2, 2.0)], FLAT_CHANGE_SCHEMA
        ),
        tmpdirs["state"],
    )
    eng = CdcEngine(EngineConfig(tables=[], heartbeat_enabled=False), spark)
    eng.register_view(tmpdirs["state"], "users_mirror")
    got = spark.sql(
        "SELECT pk, after_val FROM users_mirror ORDER BY pk"
    ).collect()
    assert [(r["pk"], r["after_val"]) for r in got] == [(1, 1.0), (2, 2.0)]

    # ADVICE r4: later merges GC the bucket dirs the registered view plan
    # referenced — the merge must re-register the view so spark.sql keeps
    # working AND serves the post-merge state, not stale/missing files.
    merge_mirror_batch(
        spark.createDataFrame([_ev("U", 3, 2, 1, 9.0)], FLAT_CHANGE_SCHEMA),
        tmpdirs["state"],
        epoch=1,
    )
    got = spark.sql(
        "SELECT pk, after_val FROM users_mirror ORDER BY pk"
    ).collect()
    assert [(r["pk"], r["after_val"]) for r in got] == [(1, 9.0), (2, 2.0)]
    spark.catalog.dropTempView("users_mirror")


def test_mirror_crash_before_manifest_swap_keeps_old_state(spark, tmpdirs):
    """Crash-safety: new epoch data written but manifest not swapped (the
    crash window) -> the mirror still reads the previous consistent state;
    replaying the same batch converges."""
    os.makedirs(tmpdirs["state"], exist_ok=True)
    b1 = spark.createDataFrame([_ev("I", 1, 1, 1, 1.0)], FLAT_CHANGE_SCHEMA)
    merge_mirror_batch(b1, tmpdirs["state"], epoch=0)
    # simulate a crashed epoch-1 write: orphan dir exists, manifest untouched
    orphan = os.path.join(tmpdirs["state"], "epochs", "e000000001", "pb=99")
    os.makedirs(orphan)
    state = {r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()}
    assert state == {1: 1.0}
    # replay of epoch 1 overwrites the orphan and commits
    b2 = spark.createDataFrame([_ev("U", 2, 2, 1, 2.0)], FLAT_CHANGE_SCHEMA)
    merge_mirror_batch(b2, tmpdirs["state"], epoch=1)
    state = {r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()}
    assert state == {1: 2.0}


def test_kafka_frames_serialization(spark):
    """Envelope -> Kafka frames: DELETE keys come from the before-image,
    key bytes are stable across non-key updates of the same row (per-key
    ordering), and the value JSON round-trips the envelope."""
    import json

    from pyspark.sql import Row

    from go_pq_cdc_spark.envelope import CHANGE_EVENT_SCHEMA
    from go_pq_cdc_spark.streaming.kafka_sink import to_kafka_frames

    rows = [
        Row(op="I", lsn=1, xid=1, commit_ts=None, message_ts=None,
            schema="public", table="users",
            before=None, after={"id": "7", "name": "a"}),
        Row(op="U", lsn=2, xid=2, commit_ts=None, message_ts=None,
            schema="public", table="users",
            before=None, after={"id": "7", "name": "b"}),
        Row(op="D", lsn=3, xid=3, commit_ts=None, message_ts=None,
            schema="public", table="users",
            before={"id": "7", "name": "b"}, after=None),
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_SCHEMA)
    frames = to_kafka_frames(df, "cdc.users", pk_keys=["id"]).collect()
    assert [f["topic"] for f in frames] == ["cdc.users"] * 3
    keys = [bytes(f["key"]).decode() for f in frames]
    # one row identity -> one key, including the DELETE (before-image)
    assert len(set(keys)) == 1
    parsed_key = json.loads(keys[0])
    assert parsed_key == {
        "schema": "public", "table": "users", "identity": {"id": "7"},
    }
    vals = [json.loads(bytes(f["value"]).decode()) for f in frames]
    assert [v["op"] for v in vals] == ["I", "U", "D"]
    assert vals[2]["before"] == {"id": "7", "name": "b"} and "after" not in vals[2]
    assert vals[0]["after"] == {"id": "7", "name": "a"}


def test_streaming_session_window(spark, tmpdirs):
    """Native streaming session windows (the streaming twin of the
    oracle-gated batch q_sessionize): events gapped > 10s per key split
    into separate sessions (complete mode: session merge can't be an
    in-place update).
    commit_ts = base + lsn seconds, so lsn runs {0,1,2} and {30,31}
    form exactly two sessions for pk=1, one for pk=2."""
    os.makedirs(tmpdirs["in"], exist_ok=True)
    _write_batch(
        spark,
        tmpdirs["in"],
        [_ev("I", lsn, 1, 1, float(lsn)) for lsn in (0, 1, 2, 30, 31)]
        + [_ev("I", lsn, 1, 2, float(lsn)) for lsn in (5, 6)],
        0,
    )
    stream = changelog_stream(spark, tmpdirs["in"] + "/*")
    agg = (
        stream.withWatermark("commit_ts", "5 minutes")
        .groupBy(F.session_window("commit_ts", "10 seconds"), "pk")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", tmpdirs["ckpt"])
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT pk, session_window.start AS s, n FROM sess_out ORDER BY pk, s"
        ).collect()
        assert [(r["pk"], r["n"]) for r in rows] == [(1, 3), (1, 2), (2, 2)]
    finally:
        q.stop()


def test_multi_column_mirror(spark, tmpdirs):
    """Whole-row mirror (reference parity: sinks get full-row images):
    each value column independently TOAST-repairs (a NULL in one column
    of an update inherits the stored value while the other column
    changes), DELETE removes the key, and the value schema is pinned in
    the manifest — a merge with different columns must refuse."""
    from pyspark.sql import Row as R

    import datetime as dt

    from go_pq_cdc_spark.streaming.changelog_stream import merge_mirror_batch

    ts = dt.datetime(2024, 1, 1)
    schema = (
        "op string, lsn bigint, xid bigint, commit_ts timestamp, "
        "pk bigint, name string, qty bigint"
    )
    b1 = spark.createDataFrame(
        [
            R("I", 1, 1, ts, 1, "alpha", 10),
            R("I", 2, 1, ts, 2, "beta", 20),
        ],
        schema,
    )
    state = tmpdirs["state"]
    merge_mirror_batch(b1, state, 0, value_cols=("name", "qty"))
    b2 = spark.createDataFrame(
        [
            R("U", 3, 2, ts, 1, None, 11),      # name TOAST-unchanged
            R("U", 4, 2, ts, 2, "beta2", None),  # qty TOAST-unchanged
            R("I", 5, 2, ts, 3, "gamma", 30),
            R("D", 6, 2, ts, 3, None, None),     # inserted then deleted
        ],
        schema,
    )
    merge_mirror_batch(b2, state, 1, value_cols=("name", "qty"))
    rows = {
        r["pk"]: (r["name"], r["qty"])
        for r in read_mirror(spark, state).collect()
    }
    assert rows == {1: ("alpha", 11), 2: ("beta2", 20)}
    # schema pinned: different columns are a rebuild, not silent drift
    with pytest.raises(ValueError, match="requires a rebuild"):
        merge_mirror_batch(b1.withColumnRenamed("qty", "amount"), state, 2,
                           value_cols=("name", "amount"))
    # ... and so are same-NAMED columns with different TYPES (a string qty
    # would write mixed-type parquet across buckets)
    with pytest.raises(ValueError, match="requires a rebuild"):
        merge_mirror_batch(
            b1.withColumn("qty", F.col("qty").cast("string")), state, 2,
            value_cols=("name", "qty"))
    # bucket-pruned point lookup follows the pinned multi-column schema
    from go_pq_cdc_spark.streaming.changelog_stream import lookup_mirror

    hits = {
        r["pk"]: (r["name"], r["qty"])
        for r in lookup_mirror(spark, state, [1]).collect()
    }
    assert hits == {1: ("alpha", 11)}
    # empty-mirror read of a NEW state dir keeps the declared single-col
    # default (legacy mirrors without value_schema read as after_val)
    empty = read_mirror(spark, tmpdirs["state"] + "_nonexistent")
    assert empty.columns == ["pk", "lsn", "op", "after_val"]


def test_mirror_time_travel_as_of_epoch(spark, tmp_path):
    """Time travel: with keep_epochs=2, the previous epoch's state stays
    readable EXACTLY as committed while older epochs raise a clear
    retention error; current reads are unaffected; GC still removes
    out-of-retention bucket dirs."""
    import pytest

    from go_pq_cdc_spark.streaming.changelog_stream import (
        merge_mirror_batch,
        read_mirror,
        read_mirror_as_of,
    )

    state = str(tmp_path / "mirror")

    def batch(rows):
        return spark.createDataFrame(
            rows, "pk bigint, lsn bigint, op string, after_val double"
        )

    merge_mirror_batch(batch([(1, 10, "I", 1.0)]), state, epoch=0,
                       n_buckets=4, keep_epochs=2)
    merge_mirror_batch(batch([(1, 20, "U", 2.0), (2, 21, "I", 5.0)]), state,
                       epoch=1, keep_epochs=2)
    merge_mirror_batch(batch([(1, 30, "D", None)]), state,
                       epoch=2, keep_epochs=2)

    now = {r["pk"]: r["after_val"] for r in read_mirror(spark, state).collect()}
    assert now == {2: 5.0}
    e1 = {r["pk"]: r["after_val"] for r in read_mirror_as_of(spark, state, 1).collect()}
    assert e1 == {1: 2.0, 2: 5.0}
    with pytest.raises(ValueError, match="not retained"):
        read_mirror_as_of(spark, state, 0)


def test_mirror_retention_is_pinned_and_empty_epochs_snapshot(spark, tmp_path):
    """r6 review fixes: (1) keep_epochs pins in the manifest — a later
    merge using the DEFAULT cannot destroy retained history; (2) an empty
    batch still commits a readable epoch snapshot; (3) an explicit value
    updates the pin."""
    from go_pq_cdc_spark.streaming.changelog_stream import (
        _read_manifest,
        merge_mirror_batch,
        read_mirror_as_of,
    )

    state = str(tmp_path / "mirror")

    def batch(rows):
        return spark.createDataFrame(
            rows, "pk bigint, lsn bigint, op string, after_val double"
        )

    empty = batch([])
    merge_mirror_batch(batch([(1, 10, "I", 1.0)]), state, epoch=0,
                       n_buckets=4, keep_epochs=3)
    assert _read_manifest(state)["keep_epochs"] == 3
    # a default-parameter writer (engine seeding / multi_mirror_sink path)
    merge_mirror_batch(batch([(1, 20, "U", 2.0)]), state, epoch=1)
    # an EMPTY epoch — still snapshotted
    merge_mirror_batch(empty, state, epoch=2)
    merge_mirror_batch(batch([(2, 30, "I", 9.0)]), state, epoch=3)

    # pinned retention (3) survived the default-parameter merges:
    # epochs 1..3 readable, epoch 0 aged out
    assert {r["pk"]: r["after_val"] for r in read_mirror_as_of(spark, state, 1).collect()} == {1: 2.0}
    assert {r["pk"]: r["after_val"] for r in read_mirror_as_of(spark, state, 2).collect()} == {1: 2.0}
    assert {r["pk"]: r["after_val"] for r in read_mirror_as_of(spark, state, 3).collect()} == {1: 2.0, 2: 9.0}
    import pytest

    with pytest.raises(ValueError, match="not retained"):
        read_mirror_as_of(spark, state, 0)
    # explicit value updates the pin
    merge_mirror_batch(batch([(3, 40, "I", 7.0)]), state, epoch=4, keep_epochs=1)
    assert _read_manifest(state)["keep_epochs"] == 1
    with pytest.raises(ValueError, match="not retained"):
        read_mirror_as_of(spark, state, 2)


def test_streamed_txn_tws_twin_matches_legacy(spark, tmpdirs):
    """The transformWithStateInPandas txn buffer must reproduce the legacy
    applyInPandasWithState operator's exact output: commit-gated delivery
    in LSN order with the commit-LSN stamp, aborts invisible.

    Env-gated like the live-PG suite: Spark's TWS state-server protocol
    needs google.protobuf, which this container does not ship (the legacy
    applyInPandasWithState operator — fully tested above — has no such
    dependency). Runs anywhere protobuf is installed."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs protobuf (not in this container)",
    )

    from go_pq_cdc_spark.streaming.txn_buffer import buffer_streamed_txns_tws

    indir = tmpdirs["in"] + "_tws"
    os.makedirs(indir, exist_ok=True)
    _write_batch(
        spark, indir,
        [_ev("I", 10, 100, 1, 1.0), _ev("U", 12, 100, 1, 1.1), _ev("I", 11, 200, 9, 9.0)],
        0,
    )
    stream = changelog_stream(spark, indir + "/*")
    out = buffer_streamed_txns_tws(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("txn_out_tws")
        .option("checkpointLocation", tmpdirs["ckpt2"] + "_tws")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM txn_out_tws").count() == 0
        _write_batch(
            spark, indir,
            [_ev("C", 20, 100, 0, None), _ev("A", 21, 200, 0, None)],
            1,
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM txn_out_tws ORDER BY lsn").collect()
        assert [(r["xid"], r["lsn"], r["commit_lsn"]) for r in rows] == [
            (100, 10, 20),
            (100, 12, 20),
        ]
        assert not [r for r in rows if r["xid"] == 200], "aborted txn leaked"
    finally:
        q.stop()


def test_epoch_collision_with_seeded_buckets_refused(spark, tmpdirs):
    """Live-PG lifecycle finding: a snapshot seed consumes mirror epoch 0,
    and a later merge passing Spark's foreachBatch batch id 0 would
    `mode(overwrite)` the SAME epoch dir — wiping every seeded bucket the
    batch doesn't touch while the manifest still references them. The
    merge must refuse the colliding explicit epoch (mirror_sink passes
    epoch=None so the manifest counter assigns fresh epochs)."""
    import pytest as _pytest

    os.makedirs(tmpdirs["state"], exist_ok=True)
    # seed: 40 pks spread across many buckets, epoch=None -> epoch 0
    seed = spark.createDataFrame(
        [_ev("R", 10, 1, pk, float(pk)) for pk in range(1, 41)],
        FLAT_CHANGE_SCHEMA,
    )
    merge_mirror_batch(seed, tmpdirs["state"], epoch=None)
    before = {
        r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()
    }
    assert len(before) == 40
    # a one-pk batch at explicit epoch 0 would clobber the other buckets
    b0 = spark.createDataFrame([_ev("U", 20, 2, 1, 99.0)], FLAT_CHANGE_SCHEMA)
    with _pytest.raises(ValueError, match="would overwrite bucket"):
        merge_mirror_batch(b0, tmpdirs["state"], epoch=0)
    # nothing was lost by the refused merge
    after = {
        r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()
    }
    assert after == before
    # the manifest-counter path applies the same batch cleanly
    merge_mirror_batch(b0, tmpdirs["state"], epoch=None)
    final = {
        r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()
    }
    assert final[1] == 99.0 and len(final) == 40


def test_merge_applies_truncate_semantics(spark, tmpdirs):
    """An op='T' row (TRUNCATE through either transport) clears all
    stored state and every earlier batch event; only later events
    survive. Replay of the same batch is idempotent, and a truncate with
    no survivors leaves an empty (but readable) mirror."""
    import datetime as _dt

    from pyspark.sql import Row

    os.makedirs(tmpdirs["state"], exist_ok=True)
    merge_mirror_batch(
        spark.createDataFrame(
            [_ev("I", 1, 1, 9, 9.0), _ev("I", 2, 1, 8, 8.0)], FLAT_CHANGE_SCHEMA
        ),
        tmpdirs["state"],
        epoch=None,
        keep_epochs=8,  # retain history so time travel across the
        # truncate can be asserted at the end
    )

    def t_row(lsn):
        return Row(
            op="T", lsn=lsn, xid=2,
            commit_ts=_dt.datetime(2024, 1, 1), pk=None, after_val=None,
        )

    batch = spark.createDataFrame(
        [_ev("I", 5, 2, 1, 1.0), t_row(6), _ev("I", 7, 3, 2, 2.0)],
        FLAT_CHANGE_SCHEMA,
    )
    merge_mirror_batch(batch, tmpdirs["state"], epoch=None)
    state = {
        r["pk"]: r["after_val"]
        for r in read_mirror(spark, tmpdirs["state"]).collect()
    }
    assert state == {2: 2.0}  # pre-truncate state AND pk1 both cleared

    # replay is idempotent
    merge_mirror_batch(batch, tmpdirs["state"], epoch=None)
    state = {
        r["pk"]: r["after_val"]
        for r in read_mirror(spark, tmpdirs["state"]).collect()
    }
    assert state == {2: 2.0}

    # truncate with NO survivors empties the mirror completely
    merge_mirror_batch(
        spark.createDataFrame([t_row(9)], FLAT_CHANGE_SCHEMA),
        tmpdirs["state"],
        epoch=None,
    )
    assert read_mirror(spark, tmpdirs["state"]).count() == 0
    # time travel across the truncate: the PRE-truncate epoch stays
    # readable within retention (its manifest snapshot pins the old
    # bucket dirs against GC)
    from go_pq_cdc_spark.streaming import read_mirror_as_of

    pre = {
        r["pk"]: r["after_val"]
        for r in read_mirror_as_of(spark, tmpdirs["state"], 0).collect()
    }
    assert pre == {9: 9.0, 8: 8.0}


# --- cross-process merge serialization (r7 advisor: cooperative-seed race) --


def test_concurrent_merges_into_one_mirror_lose_nothing(spark, tmpdirs):
    """The cooperative-seed topology: several workers merge chunk batches
    into ONE shared mirror concurrently. Without cross-process
    serialization two merges read the same manifest epoch, the second
    epoch-dir write wipes the first's bucket dirs, and the last manifest
    swap drops the other's buckets — silent data loss with the lost chunk
    already marked done (r7 advisor, high). The per-mirror merge lock +
    writer-unique epoch dirs make every concurrent schedule converge to
    the union."""
    import threading

    os.makedirs(tmpdirs["state"], exist_ok=True)
    batches = [
        [(1, 1.0), (2, 2.0)],
        [(11, 11.0), (12, 12.0)],
        [(21, 21.0), (22, 22.0)],
        [(31, 31.0), (32, 32.0)],
    ]
    errs: list[BaseException] = []

    def worker(rows):
        try:
            df = spark.createDataFrame(
                [_ev("R", 10, 1, pk, v) for pk, v in rows], FLAT_CHANGE_SCHEMA
            )
            merge_mirror_batch(df, tmpdirs["state"], epoch=None)
        except BaseException as exc:  # noqa: BLE001 — surfaced below
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(b,)) for b in batches]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errs, errs
    state = {
        r["pk"]: r["after_val"] for r in read_mirror(spark, tmpdirs["state"]).collect()
    }
    assert state == {pk: v for b in batches for pk, v in b}


def test_merge_lock_takeover_and_fence(tmp_path):
    """_MergeLock semantics: a live holder blocks peers; a stale holder
    (heartbeat past ttl) is taken over; the dispossessed holder's
    check_owned() — the pre-manifest-swap fence — raises MirrorLockLost
    so a zombie merge aborts before it can publish a stale manifest."""
    import json as _json

    from go_pq_cdc_spark.streaming.changelog_stream import (
        MirrorLockLost,
        _MergeLock,
    )

    state = str(tmp_path / "mirror")
    os.makedirs(state)
    a = _MergeLock(state, ttl_s=60.0)
    a.acquire()
    a.check_owned()
    # simulate a's process freezing: stop its heartbeat, age the file
    a._beat_stop.set()
    a._beat_thread.join(timeout=2)
    lock_path = a.path
    with open(lock_path) as f:
        doc = _json.load(f)
    doc["heartbeat_at"] -= 120.0
    with open(lock_path + ".tmp.age", "w") as f:
        _json.dump(doc, f)
    os.replace(lock_path + ".tmp.age", lock_path)
    # b sees a stale heartbeat and takes over without waiting
    b = _MergeLock(state, ttl_s=60.0)
    b.acquire()
    b.check_owned()
    with pytest.raises(MirrorLockLost):
        a.check_owned()  # the zombie is fenced at its commit point
    a.release()  # loser's release must NOT remove the new owner's lock
    b.check_owned()
    b.release()
    assert not os.path.exists(lock_path)


def test_explicit_stale_epoch_refused_even_when_empty(spark, tmpdirs):
    """The freshness guard covers the empty-batch path too: replaying a
    COMMITTED epoch number would rewrite the immutable manifest snapshot
    (time-travel history), so it is refused regardless of batch size."""
    os.makedirs(tmpdirs["state"], exist_ok=True)
    merge_mirror_batch(
        spark.createDataFrame([_ev("I", 10, 1, 1, 1.0)], FLAT_CHANGE_SCHEMA),
        tmpdirs["state"],
        epoch=None,  # -> epoch 0
    )
    empty = spark.createDataFrame([], FLAT_CHANGE_SCHEMA)
    with pytest.raises(ValueError, match="not fresh"):
        merge_mirror_batch(empty, tmpdirs["state"], epoch=0)

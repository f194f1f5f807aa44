"""Property test for the shared versioned-state protocol (r11).

Drives random streaming-shaped histories — folds with retries, torn
writes (data landed, meta crash), GC passes — against a driver-side
model, on BOTH backends (POSIX and FakeObjectStore). The invariants:

  * latest_version == the model's highest committed id, always;
  * torn writes are invisible and never change the answer;
  * a fold below a committed version raises (checkpoint-restart guard)
    and leaves state untouched;
  * GC keeps exactly the newest two committed versions, their metas
    readable, and sweeps torn orphans below the cutoff.

No Spark jobs run: data dirs are stand-in directories; GC's Hadoop-FS
deletes are driver-side JVM calls.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings, strategies as st

from go_pq_cdc_spark.snapshot.claim_backend import (
    FakeObjectStore,
    ObjectStoreBackend,
)
from go_pq_cdc_spark.streaming.versioned_state import VersionedState

# a streaming history: each step advances the batch id by 0 (retry) or 1,
# then performs one action
_STEP = st.tuples(
    st.integers(0, 1), st.sampled_from(["fold", "torn", "gc", "restart"])
)


def _mk_backend(kind):
    if kind == "posix":
        from go_pq_cdc_spark.snapshot.claim_backend import PosixLinkBackend

        return PosixLinkBackend()
    return ObjectStoreBackend(FakeObjectStore())


@pytest.mark.parametrize("kind", ["posix", "fake_store"])
@given(steps=st.lists(_STEP, min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_versioned_state_protocol_model(spark, kind, steps):
    backend = _mk_backend(kind)
    root = tempfile.mkdtemp(prefix="vs_prop_")
    try:
        vs = VersionedState(root, backend)
        committed: list[int] = []  # model: committed ids, ascending
        batch = 0
        for inc, action in steps:
            batch += inc
            if action == "fold":
                if committed and committed[-1] > batch:
                    with pytest.raises(RuntimeError, match="stale"):
                        vs.check_not_shadowed(batch)
                else:
                    vs.check_not_shadowed(batch)
                    os.makedirs(vs.version_dir(batch), exist_ok=True)
                    vs.commit(batch, {"batch_id": batch})
                    if not committed or committed[-1] != batch:
                        committed.append(batch)
            elif action == "torn":
                # data dir lands for the NEXT id, meta write crashes
                os.makedirs(vs.version_dir(batch + 1), exist_ok=True)
            elif action == "gc":
                vs.gc_versions(spark, keep=2)
                committed = committed[-2:]
            elif action == "restart":
                # checkpoint reset: ids restart BELOW the committed top;
                # the guard must refuse the fold
                if committed and committed[-1] > 0:
                    with pytest.raises(RuntimeError, match="stale"):
                        vs.check_not_shadowed(committed[-1] - 1)
            # core invariant after every step
            want = committed[-1] if committed else None
            assert vs.latest_version() == want
            for ver in committed:
                assert vs.read_meta(ver)["batch_id"] == ver
        # final GC: exactly the newest two survive, torn orphans below
        # the cutoff are swept
        vs.gc_versions(spark, keep=2)
        committed = committed[-2:]
        assert vs.latest_version() == (committed[-1] if committed else None)
        if committed:
            cutoff = committed[0]
            for e in os.listdir(root):
                if e.startswith("v") and e[1:].isdigit():
                    assert int(e[1:]) >= cutoff, f"unswept dir {e}"
    finally:
        shutil.rmtree(root, ignore_errors=True)

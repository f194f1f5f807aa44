"""Cross-application snapshot job coordination (O23 companion): atomic
claim, heartbeat liveness, stale takeover, completion marker — the
app-granularity analogue of the reference's SKIP LOCKED chunk queue
(pq/snapshot/worker.go:421-484)."""

from __future__ import annotations

import json
import time

import pytest

from go_pq_cdc_spark.snapshot import job_claim


def test_single_winner_and_completion(tmp_path):
    d = str(tmp_path)
    a = job_claim.acquire(d, "app-a")
    b = job_claim.acquire(d, "app-b")
    assert a.acquired and not b.acquired
    assert job_claim.read_job(d)["instance_id"] == "app-a"

    a.heartbeat()
    a.mark_completed()
    assert job_claim.is_completed(d)
    # peers now skip instead of waiting on a claim
    c = job_claim.acquire(d, "app-c")
    assert not c.acquired
    # completion marker is idempotent
    a.mark_completed()


def test_stale_claim_takeover(tmp_path):
    d = str(tmp_path)
    a = job_claim.acquire(d, "app-a")
    assert a.acquired
    # age the heartbeat past the TTL
    doc = job_claim.read_job(d)
    doc["heartbeat_at"] = time.time() - 1000
    with open(tmp_path / job_claim.JOB_FILE, "w") as f:
        json.dump(doc, f)

    b = job_claim.acquire(d, "app-b", claim_ttl_s=300)
    assert b.acquired
    assert job_claim.read_job(d)["instance_id"] == "app-b"
    # the usurped owner's next heartbeat fails loudly
    with pytest.raises(RuntimeError, match="claim lost"):
        a.heartbeat()


def test_release_lets_peer_claim_immediately(tmp_path):
    d = str(tmp_path)
    a = job_claim.acquire(d, "app-a")
    assert a.acquired
    a.release()
    b = job_claim.acquire(d, "app-b")
    assert b.acquired
    # releasing a claim we no longer own is a no-op
    a.release()
    assert job_claim.read_job(d)["instance_id"] == "app-b"


def test_live_claim_blocks_peers(tmp_path):
    d = str(tmp_path)
    a = job_claim.acquire(d, "app-a")
    a.heartbeat()
    b = job_claim.acquire(d, "app-b", claim_ttl_s=300)
    assert a.acquired and not b.acquired


def test_wait_completed_returns_on_stale_heartbeat(tmp_path):
    """A hard-crashed owner (intact claim file, dead heartbeat) must make
    wait_completed return False at the TTL so the caller's acquire() can
    take over — not poll the corpse until the deadline (r5 review)."""
    import json
    import os

    from go_pq_cdc_spark.snapshot import job_claim

    d = str(tmp_path)
    c = job_claim.acquire(d)
    assert c.acquired
    # age the heartbeat past the TTL
    doc = job_claim.read_job(d)
    doc["heartbeat_at"] = 0.0
    with open(os.path.join(d, job_claim.JOB_FILE), "w") as f:
        json.dump(doc, f)
    assert job_claim.wait_completed(d, timeout_s=5.0, poll_s=0.01) is False
    # and acquire's TTL arm now takes over
    assert job_claim.acquire(d).acquired


def test_acquire_replaces_torn_claim_file(tmp_path):
    """An unparseable claim file (torn write from a crashed owner) must be
    replaced by the next acquire — not spun on forever (r5 review)."""
    import os

    from go_pq_cdc_spark.snapshot import job_claim

    d = str(tmp_path)
    with open(os.path.join(d, job_claim.JOB_FILE), "w") as f:
        f.write("{not json")
    c = job_claim.acquire(d)
    assert c.acquired
    assert job_claim.read_job(d)["instance_id"] == c.instance_id

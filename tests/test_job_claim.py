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

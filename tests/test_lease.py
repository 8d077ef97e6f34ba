"""Concurrent-writer lease on run/state directories (VERDICT r4 missing #1).

The parquet+manifest state layer emulates Iceberg without its optimistic
concurrency; the lease is the documented stand-in (reference analogue:
per-project job exclusivity, apps/api/jobs/runner.py:145-151).  These tests
pin the done-criterion: two concurrent jobs against one state dir — one
proceeds, one refuses loudly, state untouched."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bibexpy_spark.lineage import (  # noqa: E402
    LEASE_FILENAME,
    RunContext,
    StateLeaseError,
    acquire_lease,
    release_lease,
)


def test_acquire_release_round_trip(tmp_path):
    d = str(tmp_path / "state")
    acquire_lease(d, owner="t1")
    lease = json.load(open(os.path.join(d, LEASE_FILENAME)))
    assert lease["pid"] == os.getpid() and lease["owner"] == "t1"
    # same-pid re-acquisition is a no-op (sequential RunContexts)
    acquire_lease(d, owner="t2")
    release_lease(d)
    assert not os.path.exists(os.path.join(d, LEASE_FILENAME))
    # release when not held is a no-op
    release_lease(d)


def test_live_foreign_holder_refuses_and_dead_holder_reclaims(tmp_path):
    """A LIVE second process holds the lease -> StateLeaseError with the
    holder named; once that process dies, acquisition reclaims."""
    d = str(tmp_path / "state")
    holder = subprocess.Popen(
        [sys.executable, "-c",
         "import sys, time; sys.path.insert(0, sys.argv[2]); "
         "from bibexpy_spark.lineage import acquire_lease; "
         "acquire_lease(sys.argv[1], owner='other-job'); "
         "print('held', flush=True); time.sleep(120)",
         d, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "held"
        with pytest.raises(StateLeaseError, match="other-job"):
            acquire_lease(d)
        # state files untouched by the refused writer (nothing created)
        assert os.listdir(d) == [LEASE_FILENAME]
    finally:
        holder.kill()
        holder.wait()
    # dead holder: pid check reclaims without waiting for the ttl
    acquire_lease(d, owner="takeover")
    assert json.load(open(os.path.join(d, LEASE_FILENAME)))["pid"] == os.getpid()


def test_expired_ttl_reclaims_even_if_pid_alive(tmp_path):
    """Cross-host fallback: a lease whose ttl expired is reclaimable even
    when its pid happens to be alive (pid 1 here — a foreign host's pid
    number can collide with a live local one)."""
    d = str(tmp_path / "state")
    os.makedirs(d)
    with open(os.path.join(d, LEASE_FILENAME), "w") as f:
        json.dump({"pid": 1, "acquired_at": time.time() - 7200,
                   "ttl_s": 3600.0, "owner": "ghost"}, f)
    acquire_lease(d, owner="me")
    assert json.load(open(os.path.join(d, LEASE_FILENAME)))["owner"] == "me"


def test_torn_lease_file_treated_as_stale(tmp_path):
    d = str(tmp_path / "state")
    os.makedirs(d)
    with open(os.path.join(d, LEASE_FILENAME), "w") as f:
        f.write("{not json")
    acquire_lease(d, owner="me")  # must not raise


def test_runcontext_acquires_lease_and_second_job_refuses(tmp_path):
    """The done-criterion end to end at the RunContext layer: job A holds
    the run dir; job B (a separate process) constructing a RunContext on
    the same (warehouse, run_id) dies with StateLeaseError before touching
    any state; after A releases, B's retry proceeds."""
    from bibexpy_spark.config import CANONICAL

    wh, rid = str(tmp_path / "wh"), "runX"
    run = RunContext(spark=None, cfg=CANONICAL, warehouse=wh, run_id=rid)
    lease_path = os.path.join(run.run_dir, LEASE_FILENAME)
    assert json.load(open(lease_path))["pid"] == os.getpid()

    code = (
        "import sys; sys.path.insert(0, sys.argv[3])\n"
        "from bibexpy_spark.config import CANONICAL\n"
        "from bibexpy_spark.lineage import RunContext, StateLeaseError\n"
        "try:\n"
        "    RunContext(spark=None, cfg=CANONICAL, warehouse=sys.argv[1], run_id=sys.argv[2])\n"
        "except StateLeaseError:\n"
        "    print('REFUSED'); sys.exit(0)\n"
        "print('ACQUIRED'); sys.exit(1)\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code, wh, rid, repo],
        capture_output=True, text=True,
    )
    assert out.returncode == 0 and "REFUSED" in out.stdout, out.stderr
    # no manifest/table corruption: the refused job created nothing
    assert sorted(os.listdir(run.run_dir)) == [LEASE_FILENAME]

    run.close()
    out2 = subprocess.run(
        [sys.executable, "-c", code, wh, rid, repo],
        capture_output=True, text=True,
    )
    assert "ACQUIRED" in out2.stdout

    # different run_id under the same warehouse never conflicts
    RunContext(spark=None, cfg=CANONICAL, warehouse=wh, run_id="runY")

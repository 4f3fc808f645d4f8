"""Crash-durability end-to-end: SIGKILL a mid-run durable soak, then
prove the restart contract on what it left behind.

Reference semantics being mirrored:
- main.go:63-83 — the app restarts in-process (exit 42) and must come
  back from an unclean death with consistent state;
- processor/threshold_persistence.go — dynamic thresholds snapshot
  periodically and restore on start;
- internal/diskmanager/clip_reconcile.go — clip↔DB orphans (either
  direction of the save-row/write-clip tear) are reconciled;
- species_tracker InitFromDatabase — first-seen maps resync from the DB.

The proof (VERDICT r4 #4): a subprocess runs the full pipeline (C++
farm → scheduler → processor → jobqueue → SQLite WAL + clip files) in
durable mode; we SIGKILL it mid-write, run recover_startup(), and
assert integrity, threshold restore, two-way reconcile convergence,
species resync, and — after a restart leg appends to the same database
— zero double-counted detections.
"""

from __future__ import annotations

import os
import signal
import sqlite3
import subprocess
import sys
import time
from pathlib import Path

import pytest

from birdnet_go_tpu.analysis.recovery import recover_startup

REPO = Path(__file__).resolve().parent.parent


def _ro_query(db: Path, sql: str) -> int:
    """Read-only poll of the victim's database while it is being
    written (WAL readers don't block the writer)."""
    try:
        con = sqlite3.connect(f"file:{db}?mode=ro", uri=True, timeout=2.0)
    except sqlite3.OperationalError:
        return 0
    try:
        return int(con.execute(sql).fetchone()[0])
    except sqlite3.OperationalError:
        return 0
    finally:
        con.close()


@pytest.fixture(scope="module")
def killed_tree(tmp_path_factory):
    """A database + clip dir left behind by a SIGKILLed durable soak."""
    root = tmp_path_factory.mktemp("crash")
    db = root / "birds.db"
    clips = root / "clips"
    env = dict(os.environ, BIRDNET_TPU_PLATFORM="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "birdnet_go_tpu.cli", "soak",
         "--streams", "200", "--seconds", "120",
         "--db", str(db), "--clips-dir", str(clips),
         "--durable", "--persist-interval", "2",
         "--hit-stride", "4"],
        cwd=REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        deadline = time.monotonic() + 90.0
        rows = thr = 0
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                pytest.fail(f"soak exited early (rc={proc.returncode}) "
                            "before the kill")
            rows = _ro_query(db, "SELECT COUNT(*) FROM detections")
            thr = _ro_query(db, "SELECT COUNT(*) FROM dynamic_thresholds")
            # enough committed state that the kill is mid-flight, and at
            # least one threshold persist interval has landed
            if rows >= 40 and thr >= 1:
                break
            time.sleep(0.5)
        else:
            pytest.fail(f"victim never reached kill state "
                        f"(rows={rows} thresholds={thr})")
        time.sleep(0.7)          # let more jobs be in flight at the kill
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=10)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=10)
    return {"db": db, "clips": clips,
            "rows_seen_before_kill": rows, "thresholds_before_kill": thr}


def test_recovery_ledger(killed_tree):
    db, clips = killed_tree["db"], killed_tree["clips"]
    # a SIGKILLed WAL writer leaves -wal/-shm behind; recovery folds it in
    future = time.time() + 3600.0        # bypass clip recency guards
    ledger = recover_startup(str(db), clips_dir=str(clips), now=future)

    assert ledger["integrity"] == "ok"
    assert ledger["detections"] >= killed_tree["rows_seen_before_kill"]
    assert ledger["duplicate_detections"] == 0
    assert ledger["thresholds_restored"] >= 1
    assert ledger["species_resynced"] >= 1
    assert "refs_aborted_reason" not in ledger["clips"]

    # convergence: after the two-way reconcile, files on disk and DB
    # references agree exactly (torn clip/DB pairs healed both ways)
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from birdnet_go_tpu.utils.diskmanager import DiskManager, RetentionPolicy

    store = Datastore(str(db))
    try:
        dm = DiskManager(clips, RetentionPolicy(mode="none"),
                         datastore=store)
        rec = dm.reconcile()
        assert rec["orphan_files"] == []
        assert rec["missing_files"] == []
    finally:
        store.close()

    # idempotency: a second recovery finds nothing left to heal
    again = recover_startup(str(db), clips_dir=str(clips), now=future)
    assert again["integrity"] == "ok"
    assert again["detections"] == ledger["detections"]
    assert again["clips"]["orphan_files_swept"] == 0
    assert again["clips"]["dangling_refs_cleared"] == 0


def test_restart_no_double_count(killed_tree):
    """Restart leg: a second durable soak appends to the recovered
    database. Every pre-kill row must survive, restored thresholds must
    carry over, and the final table must contain exactly old + newly
    persisted rows — no detection double-counted across the crash."""
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from birdnet_go_tpu.scheduler.soak import run_soak

    db, clips = killed_tree["db"], killed_tree["clips"]
    store = Datastore(str(db))
    try:
        before = store.count_detections()
        thresholds_before = len(store.load_dynamic_thresholds())
    finally:
        store.close()
    assert before > 0 and thresholds_before >= 1

    rec = run_soak(streams=100, seconds=8.0, db_path=str(db),
                   clips_dir=str(clips), durable=True,
                   persist_interval_s=2.0, hit_stride=4,
                   sim_mqtt_ms=1.0, sim_alert_ms=1.0)
    persisted = rec["actions"]["detections_persisted"]
    assert persisted > 0
    # the restarted processor restored the learned thresholds (and may
    # have learned more) — a restart never forgets
    assert rec["durable"]["thresholds_persisted"] >= thresholds_before

    store = Datastore(str(db))
    try:
        after = store.count_detections()
        assert after == before + persisted
        assert store.count_duplicate_detections() == 0
        assert store.integrity_check() == "ok"
    finally:
        store.close()

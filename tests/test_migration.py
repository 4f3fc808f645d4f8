"""Live migration machinery (datastore/migration.py).

Mirrors the reference's migration suite shape
(internal/datastore/v2/migration/worker_test.go,
state_manager_test.go): state transitions, batch resume, validation
catch-up, dual-write, cutover tail sync, cancel/rollback.
"""

import datetime
import sqlite3
import time

import pytest

from birdnet_go_tpu.analysis.results import Detection
from birdnet_go_tpu.datastore.migration import (
    MigrationStateStore, MigrationWorker)
from birdnet_go_tpu.datastore.sqlite import Datastore
from birdnet_go_tpu.taxonomy.labels import Species

from tests.test_catalog_imports_train import _make_legacy_db


def _legacy_with_n(path, n):
    """A legacy DB with n generated notes rows (plus the 2 fixture rows)."""
    _make_legacy_db(path)
    conn = sqlite3.connect(path)
    for i in range(n):
        minute = i % 60
        hour = 6 + (i // 60) % 12
        conn.execute(
            "INSERT INTO notes (date, time, scientific_name, common_name,"
            " species_code, confidence, clip_name) VALUES (?,?,?,?,?,?,?)",
            ("2024-05-02", f"{hour:02d}:{minute:02d}:{i % 60:02d}",
             f"Species s{i}", f"Common c{i}", f"sp{i}", 0.5 + (i % 40) / 100,
             ""))
    conn.commit()
    conn.close()


def _wait_state(worker, state, timeout=15.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if worker.store.get()["state"] == state:
            return
        time.sleep(0.02)
    raise AssertionError(
        f"never reached {state}; stuck at {worker.store.get()['state']}"
        f" err={worker.store.get()['error']}")


def test_full_migration_completes(tmp_path):
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 250)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=64, sleep_between=0.0)
    w.start()
    _wait_state(w, "completed")
    st = w.status()
    assert st["migrated_records"] == 252
    assert st["progress_pct"] == 100.0
    assert ds.count_detections() == 252
    # fidelity spot-check: fixture row 1 satellites carried over
    rows = ds.search_detections(species="Turdus merula")
    assert rows and rows[0]["locked"] == 1
    assert ds.get_reviews(rows[0]["id"])[0]["verdict"] == "correct"
    # dual-write hook removed after completion
    assert w._uninstall_hook is None
    w.stop()


def test_restart_resumes_from_persisted_state(tmp_path):
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 300)
    db = tmp_path / "native.db"
    ds = Datastore(db)
    w = MigrationWorker(ds, legacy, batch_size=32, sleep_between=0.0)
    w.start()
    # stop mid-flight, simulating a crash
    deadline = time.monotonic() + 15
    while w.store.get()["migrated_records"] < 40:
        assert time.monotonic() < deadline
        time.sleep(0.01)
    w.stop()
    done_before = w.store.get()["migrated_records"]
    assert 0 < done_before < 302

    ds2 = Datastore(db)
    st = MigrationStateStore(ds2).get()
    assert st["migrated_records"] == done_before   # persisted
    assert st["state"] == "migrating"              # interrupted mid-flight
    # start() on a fresh worker resumes the interrupted run in place
    # without duplicating any already-migrated row
    w2 = MigrationWorker(ds2, legacy, batch_size=64, sleep_between=0.0)
    w2.start()
    _wait_state(w2, "completed")
    assert ds2.count_detections() == 302
    w2.stop()


def test_pause_resume(tmp_path):
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 400)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=16, sleep_between=0.01)
    w.start()
    w.pause()
    _wait_state(w, "paused")
    # the batch in flight when pause() landed may still complete (the
    # reference worker also finishes its current batch); wait for it,
    # then the count must hold still
    time.sleep(0.2)
    frozen = w.store.get()["migrated_records"]
    time.sleep(0.2)
    assert w.store.get()["migrated_records"] == frozen
    w.resume()
    _wait_state(w, "completed")
    assert ds.count_detections() == 402
    w.stop()


def test_cancel_keeps_rows_rollback_removes_them(tmp_path):
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 200)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=16, sleep_between=0.01)
    w.start()
    deadline = time.monotonic() + 15
    while w.store.get()["migrated_records"] < 30:
        assert time.monotonic() < deadline
        time.sleep(0.01)
    w.cancel()
    w.stop()
    assert w.store.get()["state"] == "cancelled"
    kept = ds.count_detections()
    assert kept >= 30                       # cancel keeps migrated rows

    w.rollback()                            # rollback removes them
    assert ds.count_detections() == 0
    assert w.store.get()["state"] == "idle"
    assert w.store.map_count() == 0
    # and a fresh start can run to completion afterwards
    w2 = MigrationWorker(ds, legacy, batch_size=128, sleep_between=0.0)
    w2.start()
    _wait_state(w2, "completed")
    assert ds.count_detections() == 202
    w2.stop()


def test_rollback_refused_after_completion(tmp_path):
    legacy = tmp_path / "legacy.db"
    _make_legacy_db(legacy)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=8, sleep_between=0.0)
    w.start()
    _wait_state(w, "completed")
    with pytest.raises(RuntimeError, match="rollback unavailable"):
        w.rollback()
    w.stop()


def test_dual_write_appends_to_legacy_until_cutover(tmp_path):
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 150)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=16, sleep_between=0.01)
    w.start()
    # a live detection lands while migration runs
    deadline = time.monotonic() + 15
    while w._uninstall_hook is None:
        assert time.monotonic() < deadline
        time.sleep(0.01)
    # fractional timestamp, as the live processor produces: the legacy
    # round-trip truncates to whole seconds, and tail-sync dedup must
    # still recognize the row (second-granularity match)
    live = Detection(
        species=Species("Parus major", "Great Tit"), confidence=0.88,
        begin_seconds=0.0, end_seconds=3.0, model_id="BirdNET_V2.4",
        source_id="rtsp:cam1",
        timestamp=datetime.datetime(2024, 6, 1, 7, 30, 0, 456789),
        species_code="gretit1")
    ds.insert_detection(live)
    _wait_state(w, "completed")
    w.stop()
    # the live detection was dual-written into the legacy notes table...
    conn = sqlite3.connect(legacy)
    row = conn.execute("SELECT date, time, confidence FROM notes"
                       " WHERE scientific_name = 'Parus major'").fetchone()
    conn.close()
    assert row == ("2024-06-01", "07:30:00", 0.88)
    assert w.status()["dual_write"]["written"] == 1
    # ...and cutover's tail sync mapped it WITHOUT duplicating it natively
    assert len(ds.search_detections(species="Parus major")) == 1
    assert ds.count_detections() == 153


def test_validation_catchup_covers_midstream_inserts(tmp_path):
    """Rows inserted behind the scan cursor are caught by the validation
    catch-up rescan (worker.go validateWithCounts + runCatchUp)."""
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 60)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=16, sleep_between=0.01,
                        dual_write=False)
    w.start()
    deadline = time.monotonic() + 15
    while w.store.get()["migrated_records"] < 20:
        assert time.monotonic() < deadline
        time.sleep(0.01)
    # an external writer (old deployment still running) appends a row
    conn = sqlite3.connect(legacy)
    conn.execute(
        "INSERT INTO notes (date, time, scientific_name, common_name,"
        " species_code, confidence, clip_name) VALUES"
        " ('2024-05-03','09:00:00','Late bird','Late','lb1',0.7,'')")
    conn.commit()
    conn.close()
    _wait_state(w, "completed")
    assert ds.count_detections() == 63      # 2 fixture + 60 + 1 late
    w.stop()


def test_start_refused_when_already_running_or_done(tmp_path):
    legacy = tmp_path / "legacy.db"
    _make_legacy_db(legacy)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=8, sleep_between=0.0)
    w.start()
    _wait_state(w, "completed")
    with pytest.raises(RuntimeError, match="already completed"):
        w.start()
    w.stop()


def test_not_a_birdnet_db_rejected(tmp_path):
    bogus = tmp_path / "bogus.db"
    sqlite3.connect(bogus).executescript(
        "CREATE TABLE x (id INTEGER);").connection.close()
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, bogus)
    with pytest.raises(ValueError, match="no notes table"):
        w.start()


def test_status_shape():
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, "/nonexistent")
    st = w.status()
    assert st["state"] == "idle"
    assert st["progress_pct"] == 0.0
    assert st["dual_write"]["queued"] == 0


# -- HTTP surface (handlers_ext.py migration group) ---------------------------

from tests.test_app_integration import tiny_app  # noqa: E402,F401  (fixture)


def test_migration_endpoints_live(tmp_path, tiny_app):
    import json
    import urllib.request

    tiny_app.start(warmup=False)
    try:
        port = tiny_app.settings.webserver.port

        def req(path, method="GET", body=None):
            data = json.dumps(body).encode() if body is not None else None
            r = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v2{path}", data=data,
                headers={"Content-Type": "application/json"}, method=method)
            with urllib.request.urlopen(r, timeout=10) as resp:
                return json.loads(resp.read())

        assert req("/migration/status")["state"] == "idle"
        legacy = tmp_path / "legacy.db"
        _legacy_with_n(legacy, 120)
        out = req("/migration/start", "POST", {"path": str(legacy)})
        assert out["state"] in ("migrating", "validating", "cutover",
                                "completed")
        deadline = time.monotonic() + 20
        while req("/migration/status")["state"] != "completed":
            assert time.monotonic() < deadline
            time.sleep(0.1)
        st = req("/migration/status")
        assert st["migrated_records"] == 122
        assert st["progress_pct"] == 100.0

        # Prometheus surface (reference migration_telemetry.go)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=10) as resp:
            text = resp.read().decode()
        assert "birdnet_migration_state 4" in text      # completed
        assert "birdnet_migration_records_migrated 122" in text
    finally:
        tiny_app.stop()


def test_force_start_absorbs_second_legacy_db(tmp_path):
    """After one completed migration, force-start absorbs a different
    legacy DB; timestamp+species dedup keeps shared rows single."""
    a = tmp_path / "a.db"
    b = tmp_path / "b.db"
    _legacy_with_n(a, 30)          # fixture 2 + 30
    _make_legacy_db(b)             # fixture 2 only (overlaps a's fixtures)
    import sqlite3 as _s
    conn = _s.connect(b)
    conn.execute(
        "INSERT INTO notes (date, time, scientific_name, common_name,"
        " species_code, confidence, clip_name) VALUES"
        " ('2024-07-01','06:00:00','Only in B','B only','ob1',0.8,'')")
    conn.commit(); conn.close()

    ds = Datastore(":memory:")
    w = MigrationWorker(ds, a, batch_size=64, sleep_between=0.0)
    w.start()
    _wait_state(w, "completed")
    w.stop()
    assert ds.count_detections() == 32

    w2 = MigrationWorker(ds, b, batch_size=64, sleep_between=0.0)
    with pytest.raises(RuntimeError, match="force"):
        w2.start()
    w2.start(force=True)
    _wait_state(w2, "completed")
    w2.stop()
    # only B's unique row was added; the 2 shared fixture rows deduped
    assert ds.count_detections() == 33
    assert len(ds.search_detections(species="Only in B")) == 1


def test_auto_pause_after_consecutive_errors(tmp_path):
    """Repeated batch failures auto-pause with the error recorded
    (worker.go:1221 handleError / DefaultMaxConsecutiveErrors), and a
    manual resume picks up where it left off."""
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 40)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=8, sleep_between=0.0,
                        error_backoff=0.01, max_consecutive_errors=3,
                        dual_write=False)
    orig = ds.insert_detection

    def boom(*a, **k):
        raise OSError("disk full")

    ds.insert_detection = boom
    w.start()
    _wait_state(w, "paused")
    st = w.store.get()
    assert st["paused_from"] == "migrating"
    assert st["consecutive_errors"] == 3
    assert "disk full" in st["error"]

    ds.insert_detection = orig              # operator fixed the disk
    w.resume()
    _wait_state(w, "completed")
    assert ds.count_detections() == 42
    assert w.store.get()["error"] is None
    w.stop()


def test_start_while_paused_refused_no_second_thread(tmp_path):
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 300)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=8, sleep_between=0.01)
    w.start()
    w.pause()
    _wait_state(w, "paused")
    with pytest.raises(RuntimeError, match="resume"):
        w.start()
    assert w.store.get()["state"] == "paused"     # untouched
    w.resume()
    _wait_state(w, "completed")
    w.stop()


def test_rollback_spares_preexisting_rows(tmp_path):
    """Dedup-mapped rows predate the migration; rollback must not delete
    them (migration_map.created flag)."""
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 50)
    ds = Datastore(":memory:")
    # a detection that existed before migration, colliding with legacy row 1
    pre = Detection(
        species=Species("Turdus merula", "Eurasian Blackbird"),
        confidence=0.91, begin_seconds=0.0, end_seconds=3.0,
        model_id="BirdNET_V2.4", source_id="soundcard",
        timestamp=datetime.datetime(2024, 5, 1, 4, 55, 0, 250000),
        species_code="eurbla")
    pre_id = ds.insert_detection(pre)

    w = MigrationWorker(ds, legacy, batch_size=16, sleep_between=0.01,
                        dual_write=False)
    w.start()
    deadline = time.monotonic() + 15
    while w.store.get()["migrated_records"] < 30:
        assert time.monotonic() < deadline
        time.sleep(0.01)
    w.cancel()
    w.stop()
    w.rollback()
    # every migration-created row is gone, the pre-existing one remains
    assert ds.count_detections() == 1
    assert ds.get_detection(pre_id) is not None


def test_dual_write_commit_failure_requeues(tmp_path, monkeypatch):
    """A failed legacy commit (e.g. transient SQLITE_BUSY from the old
    deployment) must re-queue the batch like the unreachable-DB branch,
    not drop it — dropping silently breaks lossless rollback."""
    legacy = tmp_path / "legacy.db"
    _make_legacy_db(legacy)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy)
    live = Detection(
        species=Species("Parus major", "Great Tit"), confidence=0.88,
        begin_seconds=0.0, end_seconds=3.0, model_id="BirdNET_V2.4",
        source_id="rtsp:cam1",
        timestamp=datetime.datetime(2024, 6, 1, 7, 30, 0, 456789),
        species_code="gretit1")
    w._dw_queue.append((live, None))

    real_connect = sqlite3.connect

    class _CommitFails:
        def __init__(self, conn):
            self._conn = conn

        def __getattr__(self, name):
            return getattr(self._conn, name)

        def commit(self):
            raise sqlite3.OperationalError("database is locked")

    monkeypatch.setattr(
        sqlite3, "connect",
        lambda *a, **kw: _CommitFails(real_connect(*a, **kw)))
    w._drain_dual_write()
    monkeypatch.setattr(sqlite3, "connect", real_connect)

    # nothing written, nothing dropped — the row is back in the queue
    assert w._dw_written == 0 and w._dw_dropped == 0
    assert len(w._dw_queue) == 1

    w._drain_dual_write()              # legacy DB recovered
    assert w._dw_written == 1 and len(w._dw_queue) == 0
    conn = sqlite3.connect(legacy)
    n = conn.execute("SELECT COUNT(*) FROM notes"
                     " WHERE scientific_name = 'Parus major'").fetchone()[0]
    conn.close()
    assert n == 1


def test_same_second_distinct_legacy_rows_both_migrate(tmp_path):
    """Two source nodes logging the same species in the same second are
    distinct legacy rows (different confidence); the dual-write dedup
    probe must not collapse them — the reference keeps both."""
    legacy = tmp_path / "legacy.db"
    _make_legacy_db(legacy)
    conn = sqlite3.connect(legacy)
    for conf in (0.61, 0.87):
        conn.execute(
            "INSERT INTO notes (date, time, scientific_name, common_name,"
            " species_code, confidence, clip_name) VALUES"
            " ('2024-05-02','07:15:30','Cyanistes caeruleus',"
            "'Eurasian Blue Tit','blutit1',?,'')", (conf,))
    conn.commit(); conn.close()

    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=16, sleep_between=0.0)
    w.start()
    _wait_state(w, "completed")
    w.stop()
    rows = ds.search_detections(species="Cyanistes caeruleus")
    assert sorted(round(r["confidence"], 2) for r in rows) == [0.61, 0.87]
    assert ds.count_detections() == 4      # 2 fixture + both blue tits


def test_cancel_not_overwritten_by_auto_pause(tmp_path):
    """cancel() landing while the Nth failing batch is in flight must win:
    the auto-pause handler re-reads state and skips its 'paused' write."""
    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 50)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, sleep_between=0.0, error_backoff=0.01,
                        max_consecutive_errors=1, dual_write=False)

    def cancelled_midway(conn, tables, st):
        w.cancel()                     # operator cancels mid-batch
        raise RuntimeError("batch blew up")

    w._migrate_batch = cancelled_midway
    w.start()
    w._thread.join(10)
    assert not w._thread.is_alive()
    assert w.store.get()["state"] == "cancelled"


def test_validation_ignores_tail_appends_and_resets_on_progress(tmp_path):
    """Validation freezes its target at the scanned id range: rows an
    external writer (or our own dual-write) keeps appending are cutover
    tail-sync's job and must not burn validation retries. Catch-up passes
    that made forward progress reset the retry budget."""
    from birdnet_go_tpu.datastore import migration as mig
    from birdnet_go_tpu.utils.imports import open_birdnet_go_db

    legacy = tmp_path / "legacy.db"
    _legacy_with_n(legacy, 50)
    ds = Datastore(":memory:")
    w = MigrationWorker(ds, legacy, batch_size=64, sleep_between=0.0,
                        dual_write=False)
    w.start()
    _wait_state(w, "completed")
    w.stop()

    # an external writer keeps appending beyond the scanned range
    conn = sqlite3.connect(legacy)
    for i in range(10):
        conn.execute(
            "INSERT INTO notes (date, time, scientific_name, common_name,"
            " species_code, confidence, clip_name) VALUES"
            " ('2024-05-04','10:00:00','Tail bird','Tail','tb1',0.7,'')")
    conn.commit(); conn.close()

    # re-enter validation with the retry budget already exhausted: the
    # frozen count ignores the 10 tail rows, so it passes to cutover
    w.store.update(state="validating",
                   validation_attempts=mig.VALIDATION_MAX_RETRIES)
    lconn, _t = open_birdnet_go_db(legacy)
    w._validate(lconn, w.store.get())
    assert w.store.get()["state"] == "cutover"

    # genuine small gap + forward progress since the last attempt ⇒
    # catch-up continues with the retry counter reset, not exhausted
    with ds._lock:
        ds._conn.execute("DELETE FROM migration_map WHERE legacy_id IN"
                         " (SELECT legacy_id FROM migration_map LIMIT 3)")
        ds._conn.commit()
    w.store.update(state="validating",
                   validation_attempts=mig.VALIDATION_MAX_RETRIES,
                   validation_mapped=10)    # well below current map count
    w._validate(lconn, w.store.get())
    lconn.close()
    st = w.store.get()
    assert st["state"] == "migrating"       # catch-up, not failed
    assert st["validation_attempts"] == 1   # reset by forward progress

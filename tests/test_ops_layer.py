"""Ops layer: liveness watchdog state machine, quiet hours, auth, backup."""

import datetime
import io
import tarfile
import time

import pytest

from birdnet_go_tpu.audio.liveness import (
    LivenessConfig,
    LivenessWatchdog,
    SourceState,
)
from birdnet_go_tpu.audio.quiet_hours import (
    QuietHoursScheduler,
    QuietWindow,
    in_quiet_window,
)
from birdnet_go_tpu.api.auth import generate_token, is_local_address
from birdnet_go_tpu.utils.backup import (
    BackupConfig,
    BackupManager,
    LocalTarget,
    snapshot_sqlite,
)


# -- liveness state machine -------------------------------------------------------

def make_watchdog(**kw):
    clock = {"t": 1000.0}
    restarts = []
    notifies = []
    wd = LivenessWatchdog(
        LivenessConfig(silence_timeout_seconds=60, recovery_timeout_seconds=30,
                       max_recovery_attempts=2),
        restart=restarts.append,
        notify=lambda sid, st: notifies.append((sid, st)),
        clock=lambda: clock["t"], **kw)
    return wd, clock, restarts, notifies


def test_watchdog_healthy_to_alarmed_to_recovery():
    wd, clock, restarts, notifies = make_watchdog()
    wd.track("s1")
    wd.check()
    assert wd.state_of("s1") == SourceState.HEALTHY
    clock["t"] += 61
    wd.check()
    assert wd.state_of("s1") == SourceState.ALARMED
    wd.check()                              # alarmed → recovering + restart
    assert wd.state_of("s1") == SourceState.RECOVERING
    assert restarts == ["s1"]
    # data arrives → healthy again, attempts reset
    wd.data_received("s1")
    assert wd.state_of("s1") == SourceState.HEALTHY


def test_watchdog_escalates_then_fails():
    wd, clock, restarts, notifies = make_watchdog()
    wd.track("s1")
    clock["t"] += 61
    wd.check()                              # → alarmed
    wd.check()                              # → recovering (attempt 1)
    clock["t"] += 31
    wd.check()                              # recovery timed out → escalated
    assert wd.state_of("s1") == SourceState.ESCALATED
    assert notifies[-1] == ("s1", SourceState.ESCALATED)
    wd.check()                              # escalated → alarmed (retry)
    wd.check()                              # → recovering (attempt 2)
    clock["t"] += 31
    wd.check()                              # attempts exhausted → failed
    assert wd.state_of("s1") == SourceState.FAILED
    assert notifies[-1] == ("s1", SourceState.FAILED)
    assert restarts == ["s1", "s1"]


def test_watchdog_quiet_hours_suppress():
    quiet = {"s1": True}
    wd, clock, restarts, _ = make_watchdog(is_quiet=lambda s: quiet[s])
    wd.track("s1")
    clock["t"] += 3600
    wd.check()
    assert wd.state_of("s1") == SourceState.HEALTHY   # silence was expected
    quiet["s1"] = False
    wd.check()
    # quiet-end grace: the 1 h quiet window must NOT count as silence —
    # the source gets a fresh silence_timeout before any alarm
    assert wd.state_of("s1") == SourceState.HEALTHY
    clock["t"] += 61                       # past silence_timeout (60 s)
    wd.check()
    assert wd.state_of("s1") == SourceState.ALARMED


# -- quiet hours --------------------------------------------------------------------

def test_fixed_quiet_window_spanning_midnight():
    w = QuietWindow("22:00", "06:00")
    assert in_quiet_window(w, datetime.datetime(2026, 6, 1, 23, 30))
    assert in_quiet_window(w, datetime.datetime(2026, 6, 1, 2, 0))
    assert not in_quiet_window(w, datetime.datetime(2026, 6, 1, 12, 0))


def test_sun_relative_quiet_window():
    # quiet from sunset+30m to sunrise-30m in Berlin
    w = QuietWindow("sunset+30m", "sunrise-30m")
    lat, lon = 52.5, 13.4
    # midnight UTC in June: well inside the quiet window
    assert in_quiet_window(w, datetime.datetime(2026, 6, 1, 0, 0), lat, lon)
    # noon: outside
    assert not in_quiet_window(w, datetime.datetime(2026, 6, 1, 12, 0),
                               lat, lon)


def test_scheduler_per_source():
    sch = QuietHoursScheduler()
    sch.set_windows("s1", [QuietWindow("10:00", "11:00")])
    at = datetime.datetime(2026, 6, 1, 10, 30, tzinfo=datetime.timezone.utc)
    assert sch.is_quiet("s1", at)
    assert not sch.is_quiet("s2", at)
    assert not sch.is_quiet("s1", at.replace(hour=12))


# -- auth helpers -----------------------------------------------------------------------

def test_auth_local_detection_and_token():
    assert is_local_address("127.0.0.1")
    assert is_local_address("192.168.1.50")
    assert not is_local_address("8.8.8.8")
    assert not is_local_address("not-an-ip")
    t1, t2 = generate_token(), generate_token()
    assert t1 != t2 and len(t1) > 30


# -- backup -----------------------------------------------------------------------------

def test_backup_roundtrip_and_retention(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    db = tmp_path / "b.db"
    ds = Datastore(db)
    ds.insert_detection(_detection())

    cfgfile = tmp_path / "config.yaml"
    cfgfile.write_text("models: []\n")
    mgr = BackupManager(
        BackupConfig(enabled=True, target_dir=str(tmp_path / "bk"), keep=2,
                     include_config=str(cfgfile)),
        db_path=str(db))
    names = [mgr.run_once() for _ in range(3)]
    target = LocalTarget(tmp_path / "bk")
    archives = target.list()
    assert len(archives) == 2                      # retention kept 2
    assert names[-1] in archives and names[0] not in archives

    # archive contents restore to a working DB
    data = (tmp_path / "bk" / archives[-1]).read_bytes()
    with tarfile.open(fileobj=io.BytesIO(data)) as tar:
        members = {m.name for m in tar.getmembers()}
        assert members == {"database.sql", "config.yaml", "manifest.json"}
        sql = tar.extractfile("database.sql").read().decode()
    import sqlite3

    restored = sqlite3.connect(":memory:")
    restored.executescript(sql)
    (n,) = restored.execute("SELECT COUNT(*) FROM detections").fetchone()
    assert n == 1


def test_snapshot_sqlite_is_consistent_while_open(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    db = tmp_path / "live.db"
    ds = Datastore(db)
    for _ in range(5):
        ds.insert_detection(_detection())
    dump = snapshot_sqlite(str(db)).decode()
    assert "INSERT INTO" in dump and "detections" in dump
    ds.insert_detection(_detection())              # still writable after
    assert ds.count_detections() == 6

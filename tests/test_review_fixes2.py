"""Regression tests for the second code-review batch: clip-suffix format
resolution, MySQL dialect translation edge cases, GROUP BY strictness,
overnight hour windows, unicode passwords, HLS segmenter restart, RTSP
reconnect stream reuse, and device-loop backlog retry."""

import datetime
import threading
import time

import numpy as np
import pytest

from birdnet_go_tpu.datastore.sqlite import Datastore
from tests.test_realtime_core import _detection


# -- clip encoding: suffix → format ---------------------------------------------------

def test_encode_clip_accepts_m4a_suffix_without_ffmpeg(tmp_path, monkeypatch):
    """resolve_format names AAC clips .m4a; encode_clip must then accept its
    own suffix back (it maps m4a→aac) instead of raising 'unsupported'."""
    from birdnet_go_tpu.audio import aacenc, encode

    monkeypatch.setattr(encode, "_which", lambda n: None)
    monkeypatch.setattr(aacenc, "available", lambda: False)
    pcm = (np.sin(np.arange(9600) / 9.0) * 3000).astype(np.int16)
    out = encode.encode_clip(pcm, 48000, tmp_path / "clip.m4a")
    assert out.suffix == ".flac" and out.exists()   # no native AAC → FLAC
    out = encode.encode_clip(pcm, 48000, tmp_path / "clip.ogg")
    from birdnet_go_tpu.audio import opusogg

    if opusogg.opus_available():
        assert out.suffix == ".ogg" and out.exists()   # native libopus
    else:
        assert out.suffix == ".flac"                   # full fallback


def test_encode_clip_m4a_with_ffmpeg_present(tmp_path, monkeypatch):
    """ffmpeg fallback when the native AAC codec is unavailable."""
    from birdnet_go_tpu.audio import aacenc, encode

    monkeypatch.setattr(encode, "_which", lambda n: "/usr/bin/ffmpeg")
    monkeypatch.setattr(aacenc, "available", lambda: False)

    def fake_run(cmd, input=b"", capture_output=True, timeout=0):
        class R:
            returncode = 0
            stderr = b""
        from pathlib import Path

        Path(cmd[-1]).write_bytes(b"m4a")
        return R()

    monkeypatch.setattr(encode, "_run", fake_run)
    assert encode.resolve_format("aac") == ("aac", ".m4a")
    pcm = np.zeros(480, np.int16)
    out = encode.encode_clip(pcm, 48000, tmp_path / "c.m4a")
    assert out.name == "c.m4a" and out.read_bytes() == b"m4a"


# -- MySQL dialect translation ---------------------------------------------------------

def test_translate_sql_insert_or_replace_and_text_default():
    from birdnet_go_tpu.datastore.mysql import translate_sql

    out = translate_sql("INSERT OR REPLACE INTO image_cache (a) VALUES (?)")
    assert out.startswith("REPLACE INTO image_cache")
    ddl = translate_sql("CREATE TABLE t (name TEXT NOT NULL DEFAULT '',"
                        " n INTEGER NOT NULL DEFAULT 0)")
    # MySQL error 1101: BLOB/TEXT can't have a DEFAULT — must be dropped
    assert "TEXT NOT NULL DEFAULT" not in ddl
    assert "TEXT NOT NULL" in ddl
    assert "INTEGER NOT NULL DEFAULT 0" in ddl    # non-TEXT defaults kept
    # outside CREATE TABLE the literal survives (e.g. a VALUES list)
    q = translate_sql("UPDATE t SET note = 'TEXT NOT NULL DEFAULT ' WHERE 1")
    assert "DEFAULT" in q


def test_handshake_requests_found_rows():
    """CLIENT_FOUND_ROWS: rowcount must report MATCHED rows (like sqlite3)
    so no-op UPDATEs aren't misreported as not-found."""
    from tests.test_mysql import FakeMySQLServer
    from birdnet_go_tpu.datastore.mysql_wire import MySQLConnection

    s = FakeMySQLServer()
    s.start()
    try:
        c = MySQLConnection(port=s.port, user="bird", password="sekret")
        assert s.client_caps & 0x00000002          # CLIENT_FOUND_ROWS
        c.close()
    finally:
        s.stop()


# -- GROUP BY strictness ----------------------------------------------------------------

def test_species_summary_mixed_common_names():
    """Same scientific name recorded under two common names (label pack
    changed mid-season) must yield ONE summary row; the SQL aggregates
    common_name so MySQL's ONLY_FULL_GROUP_BY accepts it too."""
    ds = Datastore(":memory:")
    ds.insert_detection(_detection(common="Eurasian Blackbird"))
    ds.insert_detection(_detection(common="Common Blackbird"))
    rows = ds.species_summary()
    assert len(rows) == 1
    assert rows[0]["count"] == 2
    assert rows[0]["common_name"] in ("Eurasian Blackbird",
                                      "Common Blackbird")


# -- overnight hour windows ---------------------------------------------------------------

def test_search_detections_overnight_hour_window():
    """hour_from > hour_to means a window wrapping midnight (the owl/bat
    band 22→4); ANDing the bounds would match nothing."""
    ds = Datastore(":memory:")
    for hour, sci in ((23, "Strix aluco"), (3, "Tyto alba"),
                      (12, "Parus major")):
        ts = datetime.datetime(2026, 8, 10, hour, 15).timestamp()
        ds.insert_detection(_detection(sci=sci, ts=ts))
    rows = ds.search_detections(hour_from=22, hour_to=4)
    assert {r["scientific_name"] for r in rows} == {"Strix aluco",
                                                    "Tyto alba"}
    # a normal daytime window still ANDs
    rows = ds.search_detections(hour_from=10, hour_to=14)
    assert {r["scientific_name"] for r in rows} == {"Parus major"}
    # boundary hours are inclusive on both sides of the wrap
    rows = ds.search_detections(hour_from=23, hour_to=3)
    assert {r["scientific_name"] for r in rows} == {"Strix aluco",
                                                    "Tyto alba"}


# -- unicode credentials ------------------------------------------------------------------

def test_non_ascii_password_and_token():
    """compare_digest on str raises TypeError for non-ASCII operands — the
    check must run on encoded bytes."""
    from birdnet_go_tpu.api.security import SecurityManager
    from birdnet_go_tpu.config.settings import Settings

    s = Settings()
    s.webserver.password = "pässwörd§"
    s.webserver.auth_token = "tøken-ü"
    sm = SecurityManager(s)
    assert sm.check_password("pässwörd§")
    assert not sm.check_password("passwordS")
    assert sm.check_token("tøken-ü")
    assert not sm.check_token("tøken-u")


# -- HLS segmenter restart ------------------------------------------------------------------

class _CaptureStub:
    sample_rate = 8000

    def read_segment(self, start, end):
        n = int((end - start) * self.sample_rate)
        return np.zeros(max(n, 0), np.int16)


class _EngineStub:
    def capture_buffer(self, source_id):
        return _CaptureStub()


def test_hls_manager_survives_session_churn():
    """Stopping the last session must not strand the NEXT session without a
    segmenter (the old thread self-exited and start_session raced its
    is_alive check)."""
    from birdnet_go_tpu.audio.hlsmux import HlsManager

    m = HlsManager(_EngineStub(), segment_seconds=0.05)
    try:
        assert m.start_session("a") is not None
        t1 = m._thread
        assert t1 is not None and t1.is_alive()
        m.stop_session("a")
        time.sleep(0.15)                 # let the segmenter idle a few laps
        s = m.start_session("b")
        assert s is not None
        assert m._thread is not None and m._thread.is_alive()
        deadline = time.time() + 5
        while time.time() < deadline and not s._segments:
            time.sleep(0.02)
        assert s._segments, "segmenter never cut a segment after churn"
    finally:
        m.stop()


# -- device-loop backlog ---------------------------------------------------------------------

class _StubBatcher:
    """ModelBatcher stand-in: fixed capacity, counts dispatches."""

    def __init__(self, model_id="S", max_batch=2):
        class Spec:
            pass

        self.spec = Spec()
        self.spec.model_id = model_id
        self.max_batch = max_batch
        self._staged = 0
        self.dispatched: list[int] = []
        self.offered_starts: list[float] = []

    def offer(self, pcm, source_id, start_time, rate=0):
        if self._staged >= self.max_batch:
            return False
        self._staged += 1
        self.offered_starts.append(start_time)
        return True

    def dispatch(self):
        n = self._staged
        self._staged = 0
        if n:
            self.dispatched.append(n)
        return n

    def harvest(self):
        return 0


def test_device_loop_drains_ready_set_in_one_tick():
    """A burst larger than one megabatch is dispatched as multiple
    pipelined device batches within the SAME tick, in order — the
    round-2 one-batch-per-model-per-tick cap is gone (VERDICT r2 #1)."""
    from birdnet_go_tpu.scheduler.loop import DeviceLoop

    loop = DeviceLoop()
    b = _StubBatcher(max_batch=2)
    loop.add_batcher(b)
    pcm = np.zeros(8, np.int16)
    burst = [("S", pcm, "s1", float(i)) for i in range(5)]
    served = {"done": False}

    def provider():
        if served["done"]:
            return []
        served["done"] = True
        return list(burst)

    loop.add_provider(provider)
    assert loop.run_tick() == 5          # 2 + 2 + 1, one tick
    assert b.dispatched == [2, 2, 1]
    assert loop.run_tick() == 0
    assert b.offered_starts == [0.0, 1.0, 2.0, 3.0, 4.0]
    assert loop.windows_dropped == 0


def test_device_loop_dispatch_budget_backlog_and_drop_accounting():
    """Per-tick device dispatches are bounded by max_dispatches_per_tick;
    overflow beyond that is retried from a bounded backlog (cap
    4 × max_batch) and anything further is dropped WITH accounting."""
    from birdnet_go_tpu.scheduler.loop import DeviceLoop

    loop = DeviceLoop(max_dispatches_per_tick=2)
    b = _StubBatcher(max_batch=2)        # backlog cap = 4 × 2 = 8
    loop.add_batcher(b)
    pcm = np.zeros(8, np.int16)
    flood = [("S", pcm, "s1", float(i)) for i in range(20)]
    once = iter([flood])
    loop.add_provider(lambda: next(once, []))
    # tick 1: dispatch budget 2 → 2 batches of 2 leave, 2 more staged
    # (awaiting next tick's budget), 8 backlogged (cap 4×2), 6 dropped
    assert loop.run_tick() == 4
    assert loop.windows_dropped == 6
    total = 4
    for _ in range(10):
        total += loop.run_tick()
    assert total == 14                   # 4 + 2 staged + 8 backlog retried


def test_device_loop_capacity_info_reports_ceiling():
    from birdnet_go_tpu.scheduler.loop import DeviceLoop

    loop = DeviceLoop(tick_seconds=0.1, max_dispatches_per_tick=8)
    b = _StubBatcher(max_batch=256)
    b.budget_seconds = 1.5
    loop.add_batcher(b)
    info = loop.capacity_info()
    m = info["models"]["S"]
    assert m["ceiling_windows_per_s"] == 256 * 8 / 0.1
    assert m["ceiling_streams"] == round(256 * 8 / 0.1 * 1.5, 1)


# -- RTSP reconnect reuses the engine stream ----------------------------------------------

def test_rtsp_reconnect_preserves_engine_stream():
    """A reconnect at an unchanged SDP rate must keep the existing engine
    stream (its CaptureBuffer feeds live HLS and pending clip exports);
    tearing it down would discard the capture pre-roll."""
    from birdnet_go_tpu.audio.engine import AudioEngine
    from birdnet_go_tpu.audio.rtsp import RtspSource
    from tests.test_rtsp_e2e import SPEC, MiniRtspServer

    class OneShotRtsp(MiniRtspServer):
        def _stream(self, conn):
            super()._stream(conn)
            raise ConnectionError("end of take")   # force client reconnect

    sig = (np.sin(np.arange(8000) / 4.0) * 8000).astype(np.int16)
    srv = OneShotRtsp(sig, rate=8000, codec="L16")
    srv.start()
    eng = AudioEngine([SPEC])
    removed = []
    real_remove = eng.remove_source
    eng.remove_source = lambda sid: (removed.append(sid),
                                     real_remove(sid))[1]
    src = RtspSource(eng, srv.url, source_id="camR")
    src.start()
    try:
        deadline = time.time() + 10
        while time.time() < deadline and "camR" not in eng._streams:
            time.sleep(0.02)
        st1 = eng._streams["camR"]
        first_pkts = src.packets
        # wait for the supervisor to reconnect and stream a second take
        deadline = time.time() + 15
        while time.time() < deadline and \
                not (src.restarts >= 1 and src.packets > first_pkts):
            time.sleep(0.05)
        assert src.restarts >= 1 and src.packets > first_pkts
        assert eng._streams["camR"] is st1        # stream object reused
        assert removed == []                      # never torn down
    finally:
        src.stop()
        srv.stop()

"""Capture/stream completeness: sample-format conversion, ffprobe parsing,
channel analysis, media-mode fallback, device enumeration
(reference: capture.go:579-720, ffmpeg/probe.go, stream.go:960-968,
device.go:95, usb_linux.go)."""

import json
import struct
import subprocess

import numpy as np
import pytest

from birdnet_go_tpu.audio.capture import convert_to_s16
from birdnet_go_tpu.audio.ffmpeg import (
    FfmpegSource,
    analyze_channels,
    build_ffmpeg_args,
    probe_stream,
)


# -- sample-format conversion (S24/S32/F32 → S16) ----------------------------------

def test_convert_s16_passthrough():
    x = np.array([100, -200, 32767], np.int16)
    np.testing.assert_array_equal(convert_to_s16(x.tobytes()), x)


def test_convert_s24_3le():
    vals = [0x123456, -0x123456, 0x7FFFFF, -0x800000]
    raw = b"".join(struct.pack("<i", v)[:3] for v in vals)
    out = convert_to_s16(raw, "s24_3le")
    expect = np.array([v / 256.0 for v in vals])
    np.testing.assert_allclose(out, np.clip(np.round(expect + 0.0), -32768,
                                            32767), atol=1)


def test_convert_s32_and_s24_container():
    vals = np.array([1 << 30, -(1 << 30), (1 << 31) - 1], np.int64)
    raw = vals.astype("<i4").tobytes()
    out = convert_to_s16(raw, "s32le")
    np.testing.assert_allclose(out, np.clip(vals / 65536.0, -32768, 32767),
                               atol=1)
    vals24 = np.array([1 << 22, -(1 << 22)], np.int64)
    out = convert_to_s16(vals24.astype("<i4").tobytes(), "s24le")
    np.testing.assert_allclose(out, vals24 / 256.0, atol=1)


def test_convert_f32_and_stereo_downmix():
    x = np.array([0.5, -0.25, 1.5], np.float32)   # 1.5 clips
    out = convert_to_s16(x.tobytes(), "f32le")
    np.testing.assert_allclose(out, [16384, -8192, 32767], atol=1)
    stereo = np.array([0.5, -0.5, 0.25, 0.25], np.float32)  # L,R pairs
    out = convert_to_s16(stereo.tobytes(), "f32le", channels=2)
    np.testing.assert_allclose(out, [0, 8192], atol=1)


def test_convert_rejects_unknown():
    with pytest.raises(ValueError):
        convert_to_s16(b"\x00\x00", "u8")


# -- ffprobe parsing -----------------------------------------------------------------

class _R:
    def __init__(self, rc, stdout=b"", stderr=b""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


def test_probe_stream_parses_ffprobe_json(monkeypatch):
    import birdnet_go_tpu.audio.ffmpeg as ff

    monkeypatch.setattr(ff.shutil, "which", lambda n: f"/usr/bin/{n}")
    payload = json.dumps({
        "streams": [
            {"codec_type": "video", "codec_name": "h264"},
            {"codec_type": "audio", "codec_name": "aac",
             "sample_rate": "16000", "channels": 2},
        ],
        "format": {"format_name": "rtsp"},
    }).encode()
    calls = {}

    def fake_run(cmd, capture_output=True, timeout=0):
        calls["cmd"] = cmd
        return _R(0, stdout=payload)

    out = probe_stream("rtsp://cam/1", run=fake_run)
    assert out == {"ok": True, "has_audio": True, "has_video": True,
                   "container": "rtsp", "audio_codec": "aac",
                   "sample_rate": 16000, "channels": 2}
    assert "-rtsp_transport" in calls["cmd"]

    out = probe_stream("rtsp://cam/1",
                       run=lambda *a, **k: _R(1, stderr=b"401 Unauthorized"))
    assert out["ok"] is False and "401" in out["error"]


def test_analyze_channels_rms(monkeypatch):
    import birdnet_go_tpu.audio.ffmpeg as ff

    monkeypatch.setattr(ff.shutil, "which", lambda n: f"/usr/bin/{n}")
    # channel 0 silent, channel 1 loud square wave
    n = 48000
    inter = np.zeros(n * 2, np.int16)
    inter[1::2] = np.where(np.arange(n) % 2 == 0, 16000, -16000)

    out = analyze_channels(
        "rtsp://cam/1",
        run=lambda *a, **k: _R(0, stdout=inter.tobytes()))
    assert out["ok"] and out["best_channel"] == 1
    assert out["silent"] == [True, False]
    assert out["rms_dbfs"][1] > -8


# -- media-mode fallback ---------------------------------------------------------------

def test_build_args_media_modes():
    audio_only = build_ffmpeg_args("rtsp://cam/1")
    assert "-allowed_media_types" in audio_only
    full = build_ffmpeg_args("rtsp://cam/1", media_mode="full")
    assert "-allowed_media_types" not in full
    assert "-vn" in full                       # video still dropped
    http = build_ffmpeg_args("http://cam/stream.mp3")
    assert "-rtsp_transport" not in http


class _FakeEngine:
    def __init__(self):
        self.pcm = []

    def add_source(self, s):
        pass

    def remove_source(self, sid):
        pass

    def ingest(self, sid, pcm, timestamp=None):
        self.pcm.append(pcm)


def test_media_mode_fallback_after_quick_exits(monkeypatch):
    """Two dataless quick exits in audio-only mode → full-stream retry
    (stream.go:960-968 reactive fallback)."""
    import birdnet_go_tpu.audio.ffmpeg as ff

    monkeypatch.setattr(ff, "ffmpeg_available", lambda: True)
    modes = []

    class _FakeProc:
        def __init__(self, args):
            # record the media mode this invocation used
            modes.append("audio_only" if "-allowed_media_types" in args
                         else "full")

            class _Out:
                @staticmethod
                def read(n):
                    return b""                  # immediate EOF, no data

            self.stdout = _Out()

        def poll(self):
            return 1

        def terminate(self):
            pass

        def wait(self, timeout=None):
            return 1

        def kill(self):
            pass

    monkeypatch.setattr(ff.subprocess, "Popen",
                        lambda args, **kw: _FakeProc(args))
    monkeypatch.setattr(ff, "_QUICK_EXIT_SECONDS", 10.0)
    src = FfmpegSource(_FakeEngine(), "rtsp://cam/stream")
    src._stop.clear()

    # drive the supervisor loop manually for a few rounds
    import threading

    t = threading.Thread(target=src._supervise, daemon=True)
    t.start()
    import time

    deadline = time.time() + 10
    while "full" not in modes and time.time() < deadline:
        time.sleep(0.05)
    src._stop.set()
    t.join(timeout=5)
    assert src.media_mode == "full"
    assert modes[:2] == ["audio_only", "audio_only"]
    assert "full" in modes[2:]


def test_quick_exits_with_data_reset_no_data_streak(monkeypatch):
    """A quick exit that DID deliver audio breaks the 'produces no data'
    streak — isolated dataless blips spread over days must not accumulate
    into the 5-restart dead-endpoint tagged error."""
    import birdnet_go_tpu.audio.ffmpeg as ff

    monkeypatch.setattr(ff, "ffmpeg_available", lambda: True)
    launches = {"n": 0}

    class _DataProc:
        def __init__(self):
            launches["n"] += 1
            sent = {"done": False}

            class _Out:
                @staticmethod
                def read(n):
                    if sent["done"]:
                        return b""          # EOF → quick exit
                    sent["done"] = True
                    return b"\x00\x01" * 160   # one real PCM chunk

            self.stdout = _Out()

        def poll(self):
            return 1

        def terminate(self):
            pass

        def wait(self, timeout=None):
            return 1

        def kill(self):
            pass

    monkeypatch.setattr(ff.subprocess, "Popen",
                        lambda args, **kw: _DataProc())
    monkeypatch.setattr(ff, "_QUICK_EXIT_SECONDS", 10.0)
    src = FfmpegSource(_FakeEngine(), "rtsp://cam/stream")
    src._quick_exits = 4                    # one blip away from the tag
    src._stop.clear()
    import threading
    import time

    t = threading.Thread(target=src._supervise, daemon=True)
    t.start()
    deadline = time.time() + 10
    while launches["n"] < 3 and time.time() < deadline:
        time.sleep(0.05)
    src._stop.set()
    t.join(timeout=5)
    assert launches["n"] >= 3
    assert src._quick_exits == 0            # streak broken by data
    assert src.media_mode == "audio_only"   # no spurious mode fallback


# -- device enumeration -------------------------------------------------------------------

def test_native_device_enumeration_shape():
    from birdnet_go_tpu import native

    devs = native.alsa_list_devices()          # [] without libasound
    assert isinstance(devs, list)
    for d in devs:
        assert "name" in d and "description" in d


def test_usb_identity_probe():
    from birdnet_go_tpu.utils.sysmonitor import usb_identity

    out = usb_identity(99)                     # nonexistent card → {}
    assert out == {}


def test_resolve_device_usb_identity(monkeypatch):
    """usb:VID[:PID[:SERIAL]] specs re-match a card by identity, not index
    (reference usb_linux.go: replug-safe device selection)."""
    from birdnet_go_tpu.audio import capture
    from birdnet_go_tpu.utils import sysmonitor

    cards = [
        {"index": 0, "id": "PCH", "alsa_name": "hw:0,0"},
        {"index": 3, "id": "Mic", "alsa_name": "hw:3,0",
         "usb_vendor": "0d8c", "usb_product": "0014",
         "usb_serial": "ABC123"},
    ]
    monkeypatch.setattr(sysmonitor, "audio_devices", lambda: cards)
    assert capture.resolve_device("usb:0d8c") == "hw:3,0"
    assert capture.resolve_device("usb:0d8c:0014") == "hw:3,0"
    assert capture.resolve_device("usb:0d8c:0014:ABC123") == "hw:3,0"
    assert capture.resolve_device("hw:1,0") == "hw:1,0"   # passthrough
    import pytest as _pt
    with _pt.raises(RuntimeError, match="identity"):
        capture.resolve_device("usb:ffff")
    with _pt.raises(RuntimeError, match="identity"):
        capture.resolve_device("usb:0d8c:9999")

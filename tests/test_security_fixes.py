"""Regression tests for round-1 advisor findings (sandbox, auth, wav probe)."""

import asyncio
import io
import struct
from types import SimpleNamespace

import numpy as np

from birdnet_go_tpu.api.auth import auth_middleware
from birdnet_go_tpu.api.server import ApiServer
from birdnet_go_tpu.audio.wav import read_wav


def _server_with_export(path):
    srv = ApiServer.__new__(ApiServer)
    srv.ctx = SimpleNamespace(settings=SimpleNamespace(
        export=SimpleNamespace(path=str(path))))
    return srv


def test_media_sandbox_rejects_sibling_prefix(tmp_path):
    base = tmp_path / "clips"
    evil = tmp_path / "clips-evil"
    base.mkdir()
    evil.mkdir()
    (evil / "x.wav").write_bytes(b"pwn")
    (base / "ok.wav").write_bytes(b"ok")
    srv = _server_with_export(base)
    assert srv._sandboxed_media("ok.wav") is not None
    assert srv._sandboxed_media("../clips-evil/x.wav") is None
    assert srv._sandboxed_media("../../etc/passwd") is None
    assert srv._sandboxed_media(".") is None


def test_media_sandbox_rejects_symlink_escape(tmp_path):
    base = tmp_path / "clips"
    base.mkdir()
    outside = tmp_path / "secret.wav"
    outside.write_bytes(b"s")
    (base / "link.wav").symlink_to(outside)
    srv = _server_with_export(base)
    assert srv._sandboxed_media("link.wav") is None


class _FakeRequest:
    def __init__(self, path="/api/v2/detections", remote="127.0.0.1",
                 headers=None, query=None):
        self.path = path
        self.remote = remote
        self.headers = headers or {}
        self.query = query or {}


def _run_mw(mw, request):
    async def handler(_):
        return "OK"

    return asyncio.run(mw(request, handler))


def test_local_bypass_denied_for_proxied_requests():
    mw = auth_middleware("sekret", allow_local_bypass=True)
    # direct local connection: bypass works
    assert _run_mw(mw, _FakeRequest()) == "OK"
    # same local peer but carrying proxy headers → forwarded traffic must
    # present the token (reverse proxy on localhost must not open the API)
    resp = _run_mw(mw, _FakeRequest(
        headers={"X-Forwarded-For": "203.0.113.9"}))
    assert resp != "OK" and resp.status == 401
    # token still accepted on the proxied path
    assert _run_mw(mw, _FakeRequest(
        headers={"X-Forwarded-For": "203.0.113.9",
                 "Authorization": "Bearer sekret"})) == "OK"


def _wav_bytes(pcm: bytes, fmt=1, bits=32, rate=48000, channels=1):
    buf = io.BytesIO()
    buf.write(b"RIFF")
    buf.write(struct.pack("<I", 36 + len(pcm)))
    buf.write(b"WAVE")
    buf.write(b"fmt ")
    block = channels * bits // 8
    buf.write(struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                          rate * block, block, bits))
    buf.write(b"data")
    buf.write(struct.pack("<I", len(pcm)))
    buf.write(pcm)
    buf.seek(0)
    return buf


def test_int32_wav_with_leading_silence_decodes_as_int():
    # ADVICE r1: a genuine int32 PCM recording starting with silence must
    # not pass the float32 heuristic and be decoded as float garbage.
    sig = np.zeros(48000, np.int32)
    tail = (np.sin(np.arange(24000) / 24.0) * (2**30)).astype(np.int32)
    sig[24000:48000] = tail
    x, info = read_wav(_wav_bytes(sig.tobytes()))
    assert info.bit_depth == 32
    np.testing.assert_allclose(
        x[24000:48000], tail.astype(np.float32) / float(1 << 31),
        rtol=1e-6, atol=1e-7)


def test_float32_wav_mislabeled_as_pcm_still_detected():
    sig = (0.25 * np.sin(np.arange(48000) / 24.0)).astype(np.float32)
    x, _ = read_wav(_wav_bytes(sig.tobytes(), fmt=1, bits=32))
    np.testing.assert_allclose(x, sig, rtol=1e-6)

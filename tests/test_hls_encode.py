"""HLS fMP4/FLAC muxer + clip-encoding front end
(audio/hlsmux.py, audio/encode.py; reference internal/audiocore/hlsmux,
native_encoders gate)."""

import struct
import time
import urllib.request

import numpy as np
import pytest

from birdnet_go_tpu.audio.buffers import CaptureBuffer
from birdnet_go_tpu.audio.flac import decode_flac, streaminfo_block
from birdnet_go_tpu.audio.hlsmux import (
    HlsManager,
    HlsSession,
    init_segment,
    media_segment,
)


def parse_boxes(data: bytes, offset=0, end=None):
    """Minimal ISO-BMFF box walker (independent of the muxer's writers)."""
    end = len(data) if end is None else end
    out = []
    while offset + 8 <= end:
        size = struct.unpack(">I", data[offset:offset + 4])[0]
        kind = data[offset + 4:offset + 8].decode("latin1")
        out.append((kind, offset + 8, offset + size))
        offset += size
    return out


def box_tree(data, offset=0, end=None):
    return {k: (a, b) for k, a, b in parse_boxes(data, offset, end)}


def test_init_segment_structure():
    seg = init_segment(48000)
    top = box_tree(seg)
    assert set(top) == {"ftyp", "moov"}
    moov = box_tree(seg, *top["moov"])
    assert {"mvhd", "trak", "mvex"} <= set(moov)
    trak = box_tree(seg, *moov["trak"])
    mdia = box_tree(seg, *trak["mdia"])
    minf = box_tree(seg, *mdia["minf"])
    stbl = box_tree(seg, *minf["stbl"])
    stsd_a, stsd_b = stbl["stsd"]
    assert b"fLaC" in seg[stsd_a:stsd_b]
    assert b"dfLa" in seg[stsd_a:stsd_b]
    # mdhd timescale == sample rate (durations in samples)
    mdhd_a, _ = mdia["mdhd"]
    timescale = struct.unpack(">I", seg[mdhd_a + 12:mdhd_a + 16])[0]
    assert timescale == 48000


def test_media_segment_structure_and_frames_decode():
    rng = np.random.default_rng(0)
    pcm = (1000 * np.sin(np.arange(9000) / 9.0)
           + 30 * rng.standard_normal(9000)).astype(np.int16)
    from birdnet_go_tpu.audio.flac import encode_flac_frames

    frames = encode_flac_frames(pcm, 48000)
    durations = [4096, 4096, 9000 - 8192]
    seg = media_segment(1, 0, frames, durations)
    top = box_tree(seg)
    assert set(top) == {"styp", "moof", "mdat"}
    moof = box_tree(seg, *top["moof"])
    traf = box_tree(seg, *moof["traf"])
    assert {"tfhd", "tfdt", "trun"} <= set(traf)
    # trun sample count + data offset points at the mdat payload
    trun_a, _ = traf["trun"]
    n = struct.unpack(">I", seg[trun_a + 4:trun_a + 8])[0]
    assert n == len(frames)
    data_offset = struct.unpack(">i", seg[trun_a + 8:trun_a + 12])[0]
    moof_start = top["moof"][0] - 8
    assert seg[moof_start + data_offset:moof_start + data_offset + 2] \
        == frames[0][:2]                          # FLAC sync at first sample
    # mdat payload = concatenated FLAC frames; decodable when wrapped
    mdat_a, mdat_b = top["mdat"]
    payload = seg[mdat_a:mdat_b]
    info = streaminfo_block(48000, len(pcm))
    stream = b"fLaC" + bytes([0x80, 0, 0, len(info)]) + info + payload
    decoded, rate = decode_flac(stream)
    np.testing.assert_array_equal(decoded, pcm)


def test_session_rolling_playlist():
    cb = CaptureBuffer(48000, capacity_seconds=30)
    t0 = time.time() - 25
    cb.write((np.arange(48000 * 25) % 997).astype(np.int16), timestamp=t0)
    s = HlsSession("s1", cb, segment_seconds=2.0, codec="flac")
    now = t0 + 4
    for i in range(9):
        s.tick(now + i * 2)
    pl = s.playlist()
    assert "#EXTM3U" in pl and '#EXT-X-MAP:URI="init.mp4"' in pl
    # rolling window: only the last KEEP_SEGMENTS remain
    assert "seg9.m4s" in pl and "seg1.m4s" not in pl
    assert pl.index("#EXT-X-MEDIA-SEQUENCE:4") > 0
    assert s.segment(9) is not None and s.segment(1) is None
    # decode times advance by segment length in samples
    seg9 = s.segment(9)
    tfdt_pos = seg9.find(b"tfdt")
    base = struct.unpack(">Q", seg9[tfdt_pos + 8:tfdt_pos + 16])[0]
    assert base == 8 * 2 * 48000


class _FakeEngine:
    def __init__(self, cb):
        self.cb = cb

    def capture_buffer(self, sid):
        return self.cb if sid == "s1" else None


def test_manager_sessions_and_expiry():
    cb = CaptureBuffer(48000, capacity_seconds=10)
    cb.write(np.ones(48000, np.int16))
    mgr = HlsManager(_FakeEngine(cb), segment_seconds=0.2)
    assert mgr.start_session("nope") is None
    s = mgr.start_session("s1")
    assert s is not None
    assert mgr.heartbeat("s1")
    deadline = time.time() + 5
    while s.segment(1) is None and time.time() < deadline:
        time.sleep(0.05)
    assert s.segment(1) is not None
    assert mgr.stop_session("s1") and not mgr.heartbeat("s1")
    mgr.stop()


from tests.test_app_integration import tiny_app  # noqa: E402  fixture


@pytest.fixture()
def served(tiny_app):
    tiny_app.start(warmup=False)
    yield tiny_app, tiny_app.settings.webserver.port
    tiny_app.stop()


def test_hls_endpoints_live(served):
    app, port = served
    # add a tone source so a capture buffer exists (the app is started, so
    # the live reconfigure starts the source itself)
    app.settings.realtime.sources = [{"type": "tone", "id": "hls1"}]
    app._reconfigure_sources()

    def req(path, method="GET"):
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v2{path}", method=method,
            data=b"{}" if method == "POST" else None)
        return urllib.request.urlopen(r, timeout=10)

    with req("/audio/hls/hls1/start", "POST") as r:
        import json

        body = json.loads(r.read())
    assert body["playlist"].endswith("playlist.m3u8")
    with req("/audio/hls/hls1/init.mp4") as r:
        init = r.read()
    assert init[4:8] == b"ftyp"
    deadline = time.time() + 15
    seg_line = None
    while time.time() < deadline:
        with req("/audio/hls/hls1/playlist.m3u8") as r:
            pl = r.read().decode()
        lines = [ln for ln in pl.splitlines() if ln.endswith(".m4s")]
        if lines:
            seg_line = lines[-1]
            break
        time.sleep(0.5)
    assert seg_line, "no segment appeared"
    with req(f"/audio/hls/hls1/{seg_line}") as r:
        seg = r.read()
    assert b"moof" in seg[:64] and b"mdat" in seg
    assert req("/audio/hls/hls1/heartbeat", "POST").status == 200
    with req("/audio/hls/hls1/stop", "POST") as r:
        pass


# -- encode front end ---------------------------------------------------------------

def test_encode_clip_native_formats(tmp_path):
    from birdnet_go_tpu.audio.encode import encode_clip
    from birdnet_go_tpu.audio.wav import read_wav

    pcm = (np.arange(8000) % 512 - 256).astype(np.int16)
    out = encode_clip(pcm, 16000, tmp_path / "a.wav")
    x, info = read_wav(out)
    assert info.sample_rate == 16000 and len(x) == 8000
    out = encode_clip(pcm, 16000, tmp_path / "a.flac")
    decoded, rate = decode_flac(out.read_bytes())
    np.testing.assert_array_equal(decoded, pcm)


def test_encode_clip_lossy_falls_back_without_ffmpeg(tmp_path, monkeypatch):
    from birdnet_go_tpu.audio import aacenc, encode

    monkeypatch.setattr(encode, "_which", lambda name: None)
    monkeypatch.setattr(aacenc, "available", lambda: False)
    pcm = np.ones(4000, np.int16)
    out = encode.encode_clip(pcm, 16000, tmp_path / "clip.m4a", fmt="aac")
    assert out.suffix == ".flac" and out.exists()


def test_encode_clip_ffmpeg_invocation(tmp_path, monkeypatch):
    """The ffmpeg path builds the reference's s16le-stdin contract."""
    from birdnet_go_tpu.audio import encode

    calls = {}

    def fake_run(cmd, input=None, capture_output=True, timeout=0):
        calls["cmd"] = cmd
        calls["bytes"] = len(input)
        # the command writes to the temp path (last arg)
        from pathlib import Path

        Path(cmd[-1]).write_bytes(b"fake-aac")

        class R:
            returncode = 0
            stderr = b""

        return R()

    from birdnet_go_tpu.audio import aacenc

    monkeypatch.setattr(encode, "_which", lambda name: "/usr/bin/ffmpeg")
    monkeypatch.setattr(encode, "_run", fake_run)
    monkeypatch.setattr(aacenc, "available", lambda: False)
    pcm = np.zeros(4800, np.int16)
    out = encode.encode_clip(pcm, 48000, tmp_path / "c.m4a", fmt="aac")
    assert out.read_bytes() == b"fake-aac"
    assert calls["bytes"] == 9600
    cmd = calls["cmd"]
    assert cmd[0] == "ffmpeg" and "s16le" in cmd and "aac" in cmd
    assert encode.supported_formats()[:2] == ["wav", "flac"]

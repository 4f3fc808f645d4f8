"""Live audio streaming + audio-level SSE + sun endpoint."""

import http.client
import json
import struct
import time
import urllib.request

import numpy as np
import pytest

from tests.test_app_integration import tiny_app  # fixture


def test_live_wav_stream_and_levels(tiny_app):
    app = tiny_app
    app.settings.location.latitude = 60.17
    app.settings.location.longitude = 24.94
    app.start(warmup=False)
    port = app.settings.webserver.port

    from birdnet_go_tpu.audio.sources_file import ToneSource

    tone = ToneSource(app.engine, source_id="mic1", freq_hz=1000.0,
                      amplitude=0.5)
    app.engine.add_source(tone.source)
    tone.push_seconds(2.0)

    # live WAV: header + at least one PCM chunk arrives
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/api/v2/audio/live/mic1")
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "audio/wav"
    head = resp.read(44)
    assert head[:4] == b"RIFF" and head[8:12] == b"WAVE"
    (rate,) = struct.unpack("<I", head[24:28])
    assert rate == 48000
    body = b""
    deadline = time.time() + 5
    while len(body) < 24000 * 2 * 0.25 and time.time() < deadline:
        tone.push_seconds(0.25)
        body += resp.read1(65536)
    conn.close()
    pcm = np.frombuffer(body[:len(body) // 2 * 2], dtype="<i2")
    assert len(pcm) > 1000
    # the streamed audio carries the tone (nonzero RMS; early chunks are
    # zero-filled until the wall-clock cursor reaches pushed audio)
    assert np.sqrt(np.mean((pcm / 32768.0) ** 2)) > 0.02

    # audio-level SSE: one event with our source's level
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/api/v2/streams/audio-level")
    resp = conn.getresponse()
    tone.push_seconds(1.0)
    buf = b""
    deadline = time.time() + 8
    payload = None
    while time.time() < deadline:
        buf += resp.read1(4096)
        if b"\n\n" in buf:
            for block in buf.split(b"\n\n"):
                if b"audio-level" in block:
                    data_line = [ln for ln in block.splitlines()
                                 if ln.startswith(b"data: ")]
                    if data_line:
                        payload = json.loads(data_line[0][6:])
            if payload and "mic1" in payload:
                break
    conn.close()
    assert payload and "mic1" in payload
    # signal present (silence would be ≈ -180 dB); the wall-clock sample
    # window may straddle pushed bursts, so the bar is loose
    assert payload["mic1"]["rms_db"] > -45
    assert payload["mic1"]["clipping"] is False

    # sun endpoint
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/sun/2026-06-21",
            timeout=5) as r:
        sun = json.loads(r.read())
    assert sun["sunrise"] and sun["sunset"]
    app.stop()


def test_live_audio_unknown_source_404(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/audio/live/ghost", timeout=5)
    assert e.value.code == 404
    app.stop()


def test_live_opus_stream(tiny_app):
    """?format=opus streams a valid Ogg Opus stream when libopus is
    present (native/codecs.cpp streaming encoder), falling back to WAV
    when it is not."""
    from birdnet_go_tpu.audio import opusogg

    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port

    from birdnet_go_tpu.audio.sources_file import ToneSource

    tone = ToneSource(app.engine, source_id="mic2", freq_hz=880.0,
                      amplitude=0.5)
    app.engine.add_source(tone.source)
    tone.push_seconds(2.0)

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
    conn.request("GET", "/api/v2/audio/live/mic2?format=opus")
    resp = conn.getresponse()
    assert resp.status == 200
    if not opusogg.opus_available():
        assert resp.getheader("Content-Type") == "audio/wav"
        conn.close()
        return
    assert resp.getheader("Content-Type") == "audio/ogg"
    body = b""
    deadline = time.time() + 8
    while len(body) < 4000 and time.time() < deadline:
        tone.push_seconds(0.25)
        body += resp.read1(65536)
    conn.close()
    # must start with CRC-valid header pages; audio pages decodable
    pages = []
    try:
        pages = opusogg.parse_ogg_pages(body)
    except ValueError:
        # last page may be truncated mid-stream — parse the prefix
        for cut in range(len(body) - 1, 0, -1):
            if body[:cut].endswith(b"OggS"):
                pages = opusogg.parse_ogg_pages(body[:cut - 4])
                break
    assert pages and pages[0]["packets"][0][:8] == b"OpusHead"
    audio_packets = [p for pg in pages[2:] for p in pg["packets"]]
    assert audio_packets, "no audio pages streamed"
    pcm = opusogg.decode_opus_packets(audio_packets, 48000)
    assert len(pcm) >= 960

"""Soundlevel worker/SSE, CSV output, PWA manifest, restart endpoint."""

import json
import time
import urllib.request

import numpy as np
import pytest

from tests.test_app_integration import tiny_app  # fixture


def test_soundlevel_worker_and_sse(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port

    from birdnet_go_tpu.audio.source import AudioSource, SourceType

    src = AudioSource(source_id="slmic", source_type=SourceType.FILE,
                      display_name="slmic", sample_rate=48000)
    app.engine.add_source(src)
    # write 2 s of 1 kHz tone backdated so it falls inside the worker's
    # [now-interval, now] wall-clock sampling window
    t = np.arange(96000) / 48000.0
    pcm = (0.5 * 32767 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.int16)
    app.engine.ingest("slmic", pcm, timestamp=time.time() - 2.0)

    assert app.soundlevel is not None
    data = app.soundlevel.sample_once()
    assert "slmic" in data
    bands = np.asarray(data["slmic"]["bands_hz"])
    levels = np.asarray(data["slmic"]["levels_db"])
    assert len(bands) == len(levels)
    # 1 kHz tone: peak band near 1000 Hz
    assert abs(bands[int(levels.argmax())] - 1000.0) < 150.0

    # SSE channel delivers
    import http.client
    import threading

    events = []

    def reader():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/api/v2/soundlevels/stream")
        resp = conn.getresponse()
        buf = b""
        deadline = time.time() + 10
        while time.time() < deadline and len(events) < 1:
            buf += resp.read1(4096)
            for block in buf.split(b"\n\n"):
                if b"event: soundlevel" in block:
                    events.append(block)
                    return
        conn.close()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.3)
    app.soundlevel.publish_once()
    t.join(timeout=10)
    assert events, "no soundlevel SSE event"
    app.stop()


def test_csv_output(tmp_path):
    from birdnet_go_tpu.analysis.raven import format_csv, write_csv
    from birdnet_go_tpu.analysis.results import Detection
    from birdnet_go_tpu.taxonomy.labels import Species

    d = Detection(species=Species("Strix aluco", 'Tawny "Owl"'),
                  confidence=0.91, begin_seconds=3.0, end_seconds=6.0,
                  model_id="M", window_index=1)
    csv_text = format_csv([d])
    lines = csv_text.strip().splitlines()
    assert lines[0].startswith("Start (s),End (s)")
    assert '"Tawny ""Owl"""' in lines[1]
    out = write_csv([d], tmp_path / "field.wav", tmp_path)
    assert out.name == "field.csv" and out.read_text() == csv_text


def test_manifest_and_restart_route_exist(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/manifest.json", timeout=5) as r:
        m = json.loads(r.read())
    assert m["name"] == "BirdNET-TPU"
    # restart endpoint responds (we don't let the SIGTERM land on pytest:
    # patch os.kill inside the server process — same process here)
    import os
    import unittest.mock as um

    with um.patch.object(os, "kill") as mock_kill:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v2/system/restart", data=b"",
            method="POST")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert json.loads(r.read())["restarting"] is True
        time.sleep(1.0)
        assert mock_kill.called
    app.stop()


def test_distribution_aliases(tiny_app):
    from tests.test_api_ext import _req
    from tests.test_realtime_core import _detection

    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    app.datastore.insert_detection(_detection())
    hourly = _req(port, "/analytics/distribution/hourly")
    assert isinstance(hourly, list) and len(hourly) == 24
    sp = _req(port, "/analytics/distribution/species")
    assert sp["species"] and "scientific_name" in sp["species"][0]


def test_heatmap_csv_format(tiny_app):
    """?format=csv streams non-zero cells (reference: analytics.go
    writeActivityHeatmapCSV)."""
    import urllib.request

    from tests.test_realtime_core import _detection

    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    app.datastore.insert_detection(_detection())
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/analytics/heatmap"
            "?format=csv&from=2023-01-01&to=2024-12-31",
            timeout=10) as r:
        assert r.headers["Content-Type"].startswith("text/csv")
        body = r.read().decode()
    lines = body.strip().split("\n")
    assert lines[0] == "date,hour,count"
    assert len(lines) >= 2 and lines[1].count(",") == 2

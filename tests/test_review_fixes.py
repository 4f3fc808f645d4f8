"""Regression tests for the round-2 self-review findings (masked-secret
write-back, OAuth open redirect, terminal CSWSH, clip-name/encoder
mismatch, orphan clips, MySQL key columns, HLS 256 kHz, FLAC spectrogram
regeneration, aliased range filtering)."""

import json
import struct
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.test_app_integration import tiny_app  # fixture


@pytest.fixture()
def served(tiny_app, tmp_path):
    app = tiny_app
    app.settings.webserver.password = "realpw"
    app.settings.webserver.token_file = str(tmp_path / "tok.json")
    app.start(warmup=False)
    yield app, app.settings.webserver.port
    app.stop()


def _req(port, path, method="GET", body=None, headers=None):
    data = json.dumps(body).encode() if body is not None else None
    hdrs = dict(headers or {})
    if data:
        hdrs["Content-Type"] = "application/json"
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=data, headers=hdrs, method=method)
    with urllib.request.urlopen(req, timeout=10) as r:
        return json.loads(r.read()) if "json" in r.headers.get(
            "Content-Type", "") else r.read()


def test_masked_secrets_never_written_back(served):
    """Saving a settings section that round-trips the masked '***' must
    not overwrite the real credential."""
    app, port = served
    # GET /settings masks the password
    out = _req(port, f"/api/v2/settings")
    assert out["webserver"]["password"] == "***"
    # PATCH back the masked section with a changed port (the UI flow)
    section = dict(out["webserver"])
    section["port"] = port
    _req(port, "/api/v2/settings/webserver", "PATCH", section)
    assert app.settings.webserver.password == "realpw"   # survived
    # PUT whole-document is protected too
    _req(port, "/api/v2/settings", "PUT",
         {"webserver": {"password": "***", "gzip": True}})
    assert app.settings.webserver.password == "realpw"
    # a REAL new password still applies
    _req(port, "/api/v2/settings/webserver", "PATCH",
         {"password": "newpw"})
    assert app.settings.webserver.password == "newpw"


def test_oauth_redirect_uri_allowlist(served):
    app, port = served
    app.settings.webserver.oauth_client_secret = "s"
    # unregistered redirect target → refused (no code leaves the server)
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/api/v2/oauth2/authorize?client_id=birdnet-client"
             "&redirect_uri=https://evil.example/cb")
    assert e.value.code == 400
    # registered target is honored
    app.settings.webserver.oauth_redirect_uris = ["https://ok.example/cb"]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/oauth2/authorize"
        f"?client_id=birdnet-client&redirect_uri=https://ok.example/cb")

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **k):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    with pytest.raises(urllib.error.HTTPError) as e:
        opener.open(req, timeout=10)
    assert e.value.code == 302
    assert e.value.headers["Location"].startswith(
        "https://ok.example/cb?code=")


def test_terminal_rejects_cross_origin(served):
    app, port = served
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/system/ws",
        headers={"Origin": "https://evil.example"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 403


def test_resolve_format_matches_written_file(tmp_path, monkeypatch):
    from birdnet_go_tpu.audio import aacenc, encode

    # without ffmpeg OR native AAC: lossy requests resolve to flac
    # BEFORE naming (native AAC exists in this image, so disable it to
    # exercise the fallback chain)
    monkeypatch.setattr(encode, "_which", lambda n: None)
    monkeypatch.setattr(aacenc, "available", lambda: False)
    fmt, suffix = encode.resolve_format("aac")
    assert (fmt, suffix) == ("flac", ".flac")
    out = encode.encode_clip(np.ones(1000, np.int16), 16000,
                             tmp_path / f"clip{suffix}")
    assert out.name == "clip.flac" and out.exists()
    # with ffmpeg: aac resolves to .m4a up front
    monkeypatch.setattr(encode, "_which", lambda n: "/usr/bin/ffmpeg")
    fmt, suffix = encode.resolve_format("aac")
    assert (fmt, suffix) == ("aac", ".m4a")


def test_suppressed_db_save_leaves_no_orphan_clip(served, tmp_path):
    """When the DATABASE_SAVE interval suppresses a detection, no clip or
    PNG job may be enqueued either (no orphan files)."""
    from birdnet_go_tpu.analysis.processor import WindowPrediction
    from birdnet_go_tpu.audio.source import AudioSource, SourceType

    app, port = served
    app.settings.export.path = str(tmp_path / "clips")
    # a real source so a CaptureBuffer exists for clip export
    app.engine.add_source(AudioSource(
        source_id="orph", source_type=SourceType.FILE,
        display_name="orph", sample_rate=48000))
    app.engine.ingest("orph", np.ones(48000, np.int16))
    app.event_tracker.default_interval = 3600.0

    def approve(i):
        now = time.time() - 100
        app.processor.submit(WindowPrediction(
            source_id="orph", model_id="BirdNET_V2.4",
            start_time=now + i * 20, end_time=now + i * 20 + 3,
            indices=[0], confidences=[0.9]))
        return app.processor.flush(now=time.time() + 1e6)

    before = app.jobqueue.stats.enqueued
    assert len(approve(0)) == 1
    first_batch = app.jobqueue.stats.enqueued - before
    assert first_batch >= 3        # composite + save clip + prerender
    # second approval within the interval: DB suppressed → NO clip jobs
    assert len(approve(1)) == 1
    second_batch = app.jobqueue.stats.enqueued - before - first_batch
    assert second_batch == 0


def test_mysql_key_columns_get_lengths():
    from birdnet_go_tpu.datastore.mysql import translate_sql

    ddl = translate_sql(
        "CREATE TABLE IF NOT EXISTS dynamic_thresholds (\n"
        "    model_id TEXT NOT NULL,\n"
        "    scientific_name TEXT NOT NULL,\n"
        "    PRIMARY KEY (model_id, scientific_name)\n)")
    assert "model_id VARCHAR(191) NOT NULL" in ddl
    assert "scientific_name VARCHAR(191) NOT NULL" in ddl
    # non-key TEXT columns stay TEXT (comments may be long)
    ddl2 = translate_sql("CREATE TABLE c (text TEXT, message TEXT)")
    assert "message TEXT" in ddl2
    # SELECTs are untouched
    q = translate_sql("SELECT model_id FROM t WHERE scientific_name = ?")
    assert "VARCHAR" not in q


def test_hls_init_segment_bat_rate():
    from birdnet_go_tpu.audio.hlsmux import init_segment

    seg = init_segment(256000)                  # must not struct.error
    assert seg[4:8] == b"ftyp"
    # mdhd timescale carries the REAL rate
    i = seg.find(b"mdhd")
    timescale = struct.unpack(">I", seg[i + 16:i + 20])[0]
    assert timescale == 256000


def test_spectrogram_generation_from_flac_clip(served, tmp_path):
    from pathlib import Path

    from birdnet_go_tpu.audio.flac import encode_flac
    from tests.test_realtime_core import _detection

    app, port = served
    clips = Path(app.settings.export.path)
    clips.mkdir(parents=True, exist_ok=True)
    t = np.arange(16000) / 16000.0
    pcm = (12000 * np.sin(2 * np.pi * 2000 * t)).astype(np.int16)
    (clips / "c1.flac").write_bytes(encode_flac(pcm, 16000))
    det_id = app.datastore.insert_detection(_detection(),
                                            clip_name="c1.flac")
    cred = {"Authorization": "Basic " + __import__("base64").b64encode(
        b"x:realpw").decode()}
    out = _req(port, f"/api/v2/spectrogram/{det_id}/generate", "POST",
               {}, headers=cred)
    assert out["generated"] is True
    assert (clips / "c1.png").exists()


def test_aliased_species_pass_range_filter():
    """A label-set (legacy) name in the included set must still pass after
    the detection is canonicalized (openfauna)."""
    from birdnet_go_tpu.taxonomy import openfauna

    if not openfauna.load_aliases():
        pytest.skip("openfauna dataset not mounted")
    from birdnet_go_tpu.analysis.processor import WindowPrediction
    from birdnet_go_tpu.taxonomy.labels import LabelSet, Species
    from tests.test_processor import make_processor

    p, s, now = make_processor()
    p.labels_by_model["M2"] = LabelSet(
        species=[Species("Accipiter badius", "Shikra")])
    from birdnet_go_tpu.config.settings import ModelSettings

    p._model_settings["M2"] = ModelSettings(model_id="M2", threshold=0.5)
    # range set built from the LEGACY label name (as the app does)
    p.set_included_species({"Accipiter badius"})
    p.submit(WindowPrediction(source_id="s", model_id="M2",
                              start_time=1000.0, end_time=1003.0,
                              indices=[0], confidences=[0.9]))
    pending = p.pending_snapshot()
    assert pending, "aliased species was wrongly range-filtered"
    assert pending[0].detection.species.scientific == "Tachyspiza badia"
    # per-species threshold configured under the legacy name still applies
    s.species.config["Accipiter badius"] = {"threshold": 0.95}
    p.submit(WindowPrediction(source_id="s2", model_id="M2",
                              start_time=1000.0, end_time=1003.0,
                              indices=[0], confidences=[0.9]))
    assert not [x for x in p.pending_snapshot()
                if x.source_id == "s2"], "legacy-name threshold ignored"


def test_terminal_child_is_reaped(served):
    """Closing a terminal session must not leave a defunct shell
    (the reap happens off-thread after SIGHUP)."""
    import asyncio
    import os

    import aiohttp

    app, port = served

    async def drive():
        auth = aiohttp.BasicAuth("x", "realpw")
        async with aiohttp.ClientSession(auth=auth) as sess:
            async with sess.ws_connect(
                    f"http://127.0.0.1:{port}/api/v2/system/ws") as ws:
                await ws.send_str("echo hi\n")
                await ws.receive(timeout=5)

    asyncio.new_event_loop().run_until_complete(drive())
    deadline = time.time() + 8
    while time.time() < deadline:
        zombies = []
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                stat = open(f"/proc/{pid}/stat").read()
            except OSError:
                continue
            fields = stat[stat.rindex(")") + 2:].split()
            state, ppid = fields[0], int(fields[1])
            if state == "Z" and ppid == os.getpid():
                zombies.append(pid)
        if not zombies:
            return
        time.sleep(0.2)
    assert not zombies, f"defunct children left: {zombies}"

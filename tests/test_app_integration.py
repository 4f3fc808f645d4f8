"""Full-stack realtime integration: source → engine → device loop →
processor → actions → datastore → API (tiny model, CPU)."""

import json
import time
import urllib.request

import numpy as np
import pytest

from birdnet_go_tpu.app import Application
from birdnet_go_tpu.config.settings import ModelSettings, Settings


@pytest.fixture()
def tiny_app(tmp_path, monkeypatch):
    """Application with a tiny BirdNET and a free port."""
    import socket

    from birdnet_go_tpu.inference import loader
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import BlockSpec, EfficientNetConfig
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny_load_model(model_id, checkpoint=None, seed=0, **kw):
        import jax
        import jax.numpy as jnp

        m = BirdNETv24(num_species=6,
                       mel=MelConfig(sample_rate=48000, n_fft=256, hop=8192,
                                     n_mels=16),
                       compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                                   embedding_dim=16, num_classes=6)
        return m, m.init(jax.random.PRNGKey(0))

    monkeypatch.setattr(loader, "load_model", tiny_load_model)
    import birdnet_go_tpu.app as app_mod

    monkeypatch.setattr(app_mod, "load_model", tiny_load_model)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    settings = Settings()
    settings.models = [ModelSettings(model_id="BirdNET_V2.4", threshold=0.0)]
    settings.database.path = str(tmp_path / "test.db")
    settings.export.path = str(tmp_path / "clips")
    settings.export.clip_length_seconds = 4.0
    settings.export.pre_capture_seconds = 1.0
    # local backup target so the System page's Backup now / Verify flow is
    # exercisable (BackupManager's scheduler waits interval_hours before
    # its first run, so this adds no background work to other tests)
    settings.backup.enabled = True
    settings.backup.target_dir = str(tmp_path / "backups")
    settings.webserver.host = "127.0.0.1"
    settings.webserver.port = port
    settings.realtime.tick_ms = 20
    settings.realtime.max_batch = 8

    app = Application(settings)
    app.setup()
    yield app
    # stop() is idempotent-ish; tests call it themselves when needed
    try:
        app.stop()
    except Exception:
        pass


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2{path}", timeout=5) as r:
        return json.loads(r.read())


def test_full_pipeline_detection_flow(tiny_app):
    app = tiny_app
    app.start()
    port = app.settings.webserver.port

    # push 6 s of audio through a synchronous tone source
    from birdnet_go_tpu.audio.sources_file import ToneSource

    tone = ToneSource(app.engine, source_id="t1", freq_hz=2000.0)
    app.engine.add_source(tone.source)
    for _ in range(6):
        tone.push_seconds(1.0)
        time.sleep(0.05)

    # wait for the device loop to process windows
    deadline = time.time() + 15
    while time.time() < deadline:
        if app.processor.stats.results_processed >= 3:
            break
        time.sleep(0.1)
    assert app.processor.stats.results_processed >= 3

    # force a flush; the 1 s background flusher may already have approved
    # some items (their 3 s deadline can pass during the wait above)
    app.processor.flush(now=time.time() + 1e6)
    assert app.processor.stats.detections_approved >= 1, \
        "expected at least one approved detection"

    # actions run through the job queue → datastore
    deadline = time.time() + 10
    while time.time() < deadline:
        if app.datastore.count_detections() > 0:
            break
        time.sleep(0.1)
    assert app.datastore.count_detections() > 0

    # API surface
    health = _get(port, "/health")
    assert health["status"] == "healthy"
    recents = _get(port, "/detections/recent")
    assert recents and "scientific_name" in recents[0]
    info = _get(port, "/system/info")
    assert "t1" in info["sources"]
    inference = _get(port, "/system/inference")
    assert inference[0]["windows_processed"] >= 3
    stats = _get(port, "/system/scheduler")
    assert stats["processor"]["approved"] >= 1
    summary = _get(port, "/analytics/summary")
    assert summary[0]["count"] >= 1
    app.stop()


def test_api_detection_crud_and_settings(tiny_app):
    app = tiny_app
    app.start()
    port = app.settings.webserver.port

    # seed a detection directly
    from tests.test_realtime_core import _detection

    det_id = app.datastore.insert_detection(_detection())

    row = _get(port, f"/detections/{det_id}")
    assert row["scientific_name"] == "Turdus merula"

    # review
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/detections/{det_id}/review",
        data=json.dumps({"verdict": "correct"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        assert json.loads(r.read())["review_id"] == 1

    # lock then delete → 409
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/detections/{det_id}/lock",
        data=b"{}", headers={"Content-Type": "application/json"},
        method="POST")
    urllib.request.urlopen(req, timeout=5).read()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/detections/{det_id}",
        method="DELETE")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=5)
    assert exc.value.code == 409

    # settings PATCH merges + signals
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/settings/privacy_filter",
        data=json.dumps({"confidence": 0.2}).encode(),
        headers={"Content-Type": "application/json"}, method="PATCH")
    with urllib.request.urlopen(req, timeout=5) as r:
        body = json.loads(r.read())
    assert body["updated"] == "privacy_filter"
    assert app.settings.privacy_filter.confidence == 0.2

    # unknown section 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/settings/nonsense",
        data=b"{}", headers={"Content-Type": "application/json"},
        method="PATCH")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=5)
    assert exc.value.code == 404
    app.stop()


def test_sse_stream_delivers_detection(tiny_app):
    import http.client
    import threading

    app = tiny_app
    app.start()
    port = app.settings.webserver.port

    events = []

    def reader():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("GET", "/api/v2/detections/stream")
        resp = conn.getresponse()
        buf = b""
        while len(events) < 2:
            chunk = resp.read1(4096)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                raw, buf = buf.split(b"\n\n", 1)
                if raw.strip():
                    events.append(raw.decode())
        conn.close()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    time.sleep(0.5)                      # let the client subscribe

    app.api.sse.publish("detections", "detection",
                        {"common_name": "Great Tit", "confidence": 0.93})
    t.join(timeout=10)
    assert any("connected" in e for e in events)
    assert any("Great Tit" in e for e in events)
    app.stop()


def test_config1_overlap_deepdetection_rangefilter(tiny_app, monkeypatch):
    """North-star config 1: overlap windows + Deep Detection repeat
    confirmation + geomodel range filter, composed in ONE realtime app.
    Only range-included species may persist, and each persisted item must
    carry >= the level's required hit count (false_positive_filter.go
    semantics at level 2 / overlap 2.0: >=2 confirmations)."""
    import jax.numpy as jnp
    import numpy as np

    import birdnet_go_tpu.app as app_mod
    from birdnet_go_tpu.analysis import deep_detection

    # tiny_app is used only for its load_model monkeypatch; this test
    # builds its OWN Application (the fixture's instance already ran
    # setup() with different settings)
    from birdnet_go_tpu.app import Application
    from birdnet_go_tpu.config.settings import ModelSettings, Settings

    s = Settings()
    s.models = [ModelSettings(model_id="BirdNET_V2.4", threshold=0.0)]
    s.database.path = ":memory:"
    s.realtime.tick_ms = 20
    s.realtime.max_batch = 8

    class FakeGeomodel:
        def apply(self, params, coords):
            # species 0 and 2 occur here; the rest are out of range
            n = coords.shape[0]
            scores = jnp.zeros((n, 6), jnp.float32)
            return scores.at[:, 0].set(0.9).at[:, 2].set(0.8)

    monkeypatch.setattr(app_mod, "load_geomodel",
                        lambda num_species=6, **kw: (FakeGeomodel(), {}))
    s.range_filter.enabled = True
    s.location.latitude = 60.2
    s.location.longitude = 24.9
    s.models[0].overlap = 2.0                  # windows every 1 s
    s.deep_detection.level = 2
    s.realtime.sources = [{"type": "tone", "id": "tone0", "freq": 1800}]
    s.export.enabled = False
    s.webserver.enabled = False

    app = Application(s)
    app.setup()
    required = deep_detection.min_detections(2, 2.0)
    assert required >= 2
    inc = app.processor.included_species
    assert inc is not None and len([n for n in inc
                                    if n.startswith("Synthetica")]) == 2

    app.start(warmup=False)
    try:
        import time as _t

        deadline = _t.time() + 40
        rows = []
        while _t.time() < deadline:
            # let repeat hits accrue between forced flushes — flushing
            # every instant would discard every pending at 1/required
            # hits (exactly what Deep Detection is supposed to reject)
            _t.sleep(2.0)
            app.processor.flush(now=_t.time() + 1e6)
            rows = app.datastore.recent_detections(50)
            if len(rows) >= 2:
                break
        st = app.processor.stats
        assert rows, (
            f"no detections approved (submitted={st.results_processed} "
            f"filtered={st.detections_filtered} "
            f"reasons={dict(st.discard_reasons)} "
            f"pending={len(app.processor.pending_snapshot())})")
        allowed = {sp for sp in inc}
        for r in rows:
            assert r["scientific_name"] in allowed
            full = app.datastore.get_detection(r["id"])
            assert sum(c["hit_count"] for c in full["contributions"]) \
                >= required
        # the filter actually discarded out-of-range species
        assert app.processor.stats.discard_reasons.get(
            "range filter", 0) + app.processor.stats.detections_filtered > 0
    finally:
        app.stop()


def test_config3_bat_256khz_ultrasonic_pipeline(tmp_path, monkeypatch):
    """North-star config 3 (BASELINE.json configs[3]): BattyBirdNET
    regional bat classifier fed 256 kHz ultrasonic capture through ONE
    realtime app — the raw-rate "slow-down trick" path end to end.

    Proves, in one run (reference semantics cited per leg):
    - 256 kHz audio is fed UNRESAMPLED, so each 144,000-sample model
      window spans 0.5625 s of wall clock (detection-pipeline.md:103-117);
    - the on-device ultrasonic CV filter rejects steady-tone windows and
      passes pulsed bat-call-like windows (ultrasonic/filter.go:20-71,
      processor.go:881-893);
    - bat-model clips export at the NATIVE rate so echolocation content
      survives (export.go / app.py raw-rate branch);
    - Deep Detection uses the bat level by default (defaults.go:106-108).
    """
    import jax
    import jax.numpy as jnp

    import birdnet_go_tpu.app as app_mod
    from birdnet_go_tpu.analysis import deep_detection
    from birdnet_go_tpu.inference import loader
    from birdnet_go_tpu.models.bat import BatClassifier
    from birdnet_go_tpu.models.efficientnet import BlockSpec, EfficientNetConfig
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny_bat(model_id, checkpoint=None, seed=0, **kw):
        assert model_id == "BattyBirdNET"
        m = BatClassifier(num_species=6,
                          mel=MelConfig(sample_rate=48000, n_fft=256,
                                        hop=8192, n_mels=16),
                          compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                                   embedding_dim=16, num_classes=6)
        return m, m.init(jax.random.PRNGKey(0))

    monkeypatch.setattr(loader, "load_model", tiny_bat)
    monkeypatch.setattr(app_mod, "load_model", tiny_bat)

    s = Settings()
    s.models = [ModelSettings(model_id="BattyBirdNET", threshold=0.0)]
    s.database.path = str(tmp_path / "bat.db")
    s.export.enabled = True
    s.export.format = "wav"
    s.export.path = str(tmp_path / "clips")
    s.export.clip_length_seconds = 1.0
    s.export.pre_capture_seconds = 0.2
    s.realtime.tick_ms = 20
    s.realtime.max_batch = 8
    s.realtime.capture_buffer_seconds = 10.0
    # two 256 kHz ultrasonic sources: a pulsed 30 kHz "bat call" (band
    # energy varies frame to frame => high CV, passes) and a steady
    # 30 kHz tone (CV ~ 0 => the filter's designed reject)
    s.realtime.sources = [
        {"type": "tone", "id": "bat-pulsed", "freq": 30000,
         "rate": 256000, "pulse": 25, "speed": 2.0},
        {"type": "tone", "id": "bat-steady", "freq": 30000,
         "rate": 256000, "speed": 2.0},
    ]
    s.webserver.enabled = False
    assert s.ultrasonic_filter.enabled          # on by default

    app = Application(s)
    app.setup()
    # bat models take the bat Deep Detection level by default (level 2
    # at default overlap -> 1 confirmation; the LEVEL selection is what
    # is under test here, config 1 covers multi-hit confirmation)
    level, overlap = app.processor._deep_detection_params("BattyBirdNET")
    assert level == s.deep_detection.bat_level == 2
    assert deep_detection.min_detections(level, overlap) >= 1

    app.start(warmup=False)
    try:
        deadline = time.time() + 60
        pulsed_rows, us_discards = [], 0
        while time.time() < deadline:
            time.sleep(1.0)
            app.processor.flush(now=time.time() + 1e6)
            rows = app.datastore.recent_detections(100)
            pulsed_rows = [r for r in rows
                           if r["source_id"] == "bat-pulsed"]
            us_discards = app.processor.stats.discard_reasons.get(
                "ultrasonic filter", 0)
            if len(pulsed_rows) >= 2 and us_discards >= 2:
                break
        st = app.processor.stats
        assert pulsed_rows, (
            f"no pulsed-source detections (processed="
            f"{st.results_processed} reasons={dict(st.discard_reasons)})")
        assert us_discards >= 2, (
            f"steady-tone windows not rejected by the ultrasonic filter "
            f"(reasons={dict(st.discard_reasons)})")

        # slow-down trick: the 256 kHz source is tapped UNRESAMPLED
        # (resampler None, buffer timeline at the raw rate), so a
        # 144,000-sample nominal-3 s window spans 0.5625 s of wall clock
        for sid in ("bat-pulsed", "bat-steady"):
            tap = app.engine._streams[sid].taps[0]
            assert tap.resampler is None
            assert tap.rate == 256000
        # stored rows span merged repeat hits, but no single-window span
        # can be shorter than one raw-rate window (0.5625 s)
        for r in pulsed_rows:
            assert r["end_time"] - r["begin_time"] >= 0.5625 - 1e-6, r

        # steady-tone approvals can only come from the zero-prefixed
        # FIRST window (step edge => high CV); steady state must reject
        steady_rows = [r for r in app.datastore.recent_detections(100)
                       if r["source_id"] == "bat-steady"]
        assert len(steady_rows) <= 6, \
            f"steady tone kept detecting: {len(steady_rows)} rows"

        # native-rate clip export: wait for a pulsed clip file, read it
        from birdnet_go_tpu.audio.wav import read_wav

        clip_dir = tmp_path / "clips"
        deadline = time.time() + 30
        wavs = []
        while time.time() < deadline:
            wavs = list(clip_dir.rglob("*.wav"))
            if wavs:
                break
            time.sleep(0.5)
        assert wavs, "no clip exported"
        _, info = read_wav(wavs[0])
        assert info.sample_rate == 256000, \
            f"bat clip must keep the native rate, got {info.sample_rate}"
    finally:
        app.stop()

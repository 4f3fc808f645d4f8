"""Second extended-API batch: on-demand clips, audio processing,
integrations tests, app bootstrap, SSE/control introspection, system
audio/equalizer, network interfaces, restart status, database overview,
operational events, diagnostics run, import validation.

Reference: media.go (clip extraction + ProcessAudioByID), the
integrations test endpoints, routes_enumeration_test.go."""

import json
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests.test_api_ext import _req, served, tiny_app  # noqa: F401
from tests.test_realtime_core import _detection


def test_app_config_and_wizard(served, tmp_path):  # noqa: F811
    app, port = served
    app.settings.data_dir = str(tmp_path / "data")
    cfg = _req(port, "/app/config")
    assert cfg["models"] == ["BirdNET_V2.4"]
    assert cfg["wizard_dismissed"] is False
    assert _req(port, "/app/wizard/dismiss", "POST", {})["dismissed"]
    assert _req(port, "/app/config")["wizard_dismissed"] is True


def test_control_actions_and_sse_status(served):  # noqa: F811
    app, port = served
    acts = _req(port, "/control/actions")["actions"]
    assert any(a["action"] == "rebuild_range_filter" for a in acts)
    assert len(acts) >= 15
    sse = _req(port, "/sse/status")
    assert sse["total"] == 0 and "detections" in sse["channels"]


def test_system_audio_sources_and_interfaces(served):  # noqa: F811
    app, port = served
    src = _req(port, "/system/audio/sources")["sources"]
    assert isinstance(src, list)
    active = _req(port, "/system/audio/active")["active"]
    assert isinstance(active, list)
    nics = _req(port, "/system/network-interfaces")["interfaces"]
    assert any(i["name"] == "lo" for i in nics)


def test_equalizer_config_roundtrip_and_hot_swap(served):  # noqa: F811
    app, port = served
    assert _req(port, "/system/audio/equalizer/config")["enabled"] is False
    out = _req(port, "/system/audio/equalizer/config", "PUT", {
        "enabled": True,
        "filters": [{"type": "highpass", "frequency": 300, "q": 0.7071}]})
    assert out["enabled"] and len(out["filters"]) == 1
    # bad filter spec rejected without touching the live chain
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/system/audio/equalizer/config", "PUT",
             {"filters": [{"type": "flanger", "frequency": 1}]})
    assert e.value.code == 400
    assert app.engine.eq_specs and app.engine.eq_specs[0]["type"] == \
        "highpass"


def test_engine_equalizer_filters_audio():
    """A 100 Hz tone through a 300 Hz highpass is strongly attenuated;
    a 2 kHz tone passes (filters run ahead of every consumer)."""
    from birdnet_go_tpu.audio.engine import AudioEngine
    from tests.test_realtime_core import SPEC_A, _src

    eng = AudioEngine([SPEC_A], eq_specs=[
        {"type": "highpass", "frequency": 300, "q": 0.7071}])
    eng.add_source(_src())
    t = np.arange(48000 * 4) / 48000.0
    low = (10000 * np.sin(2 * np.pi * 100 * t)).astype(np.int16)
    eng.ingest("s1", low, timestamp=100.0)
    w_low = eng.collect_ready()[-1][1]
    eng2 = AudioEngine([SPEC_A], eq_specs=[
        {"type": "highpass", "frequency": 300, "q": 0.7071}])
    eng2.add_source(_src())
    high = (10000 * np.sin(2 * np.pi * 2000 * t)).astype(np.int16)
    eng2.ingest("s1", high, timestamp=100.0)
    w_high = eng2.collect_ready()[-1][1]
    rms_low = float(np.sqrt(np.mean(w_low.astype(np.float64) ** 2)))
    rms_high = float(np.sqrt(np.mean(w_high.astype(np.float64) ** 2)))
    assert rms_low < rms_high * 0.15       # >16 dB separation
    # hot-swap to no EQ restores passthrough
    eng.set_equalizer(None)
    eng.ingest("s1", low, timestamp=200.0)
    w2 = eng.collect_ready()[-1][1]
    rms2 = float(np.sqrt(np.mean(w2.astype(np.float64) ** 2)))
    assert rms2 > rms_low * 3


def test_restart_status_tracks_tls_changes(served, tmp_path):  # noqa: F811
    app, port = served
    app.settings.webserver.tls_dir = str(tmp_path / "tls")
    assert _req(port, "/system/restart-status")["restart_required"] is False
    _req(port, "/tls/certificate/generate", "POST", {})
    st = _req(port, "/system/restart-status")
    assert st["restart_required"] and "tlsCertificate" in st["reasons"]


def test_db_overview_and_diagnostics_run(served):  # noqa: F811
    app, port = served
    app.datastore.insert_detection(_detection())
    ov = _req(port, "/system/database/overview")
    assert ov["engine"] == "sqlite" and ov["detections"] == 1
    assert ov["size_bytes"] > 0
    diag = _req(port, "/system/diagnostics/run", "POST", {})
    assert diag["checks"] and isinstance(diag["healthy"], bool)


def test_operational_events_endpoint(served):  # noqa: F811
    app, port = served
    from birdnet_go_tpu.utils.events import Event

    app.events.publish(Event("health", {"note": "test-op-event"}))
    evs = _req(port, "/system/events/operational")["events"]
    assert any(e["payload"].get("note") == "test-op-event" for e in evs
               if isinstance(e["payload"], dict))
    assert _req(port, "/system/events/operational?kind=nope")["events"] == []


def test_mqtt_status_and_test_unconfigured(served):  # noqa: F811
    app, port = served
    st = _req(port, "/integrations/mqtt/status")
    assert st["connected"] is False and st["enabled"] is False
    app.settings.mqtt.host = "127.0.0.1"
    app.settings.mqtt.port = 1      # nothing listens: clean failure
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/integrations/mqtt/test", "POST", {})
    assert e.value.code == 502
    # HA discovery needs a live connection
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/integrations/mqtt/homeassistant/discovery", "POST", {})
    assert e.value.code == 502


def test_integration_tests_unconfigured_503(served):  # noqa: F811
    app, port = served
    for path in ("/integrations/birdweather/test",
                 "/integrations/ebird/test",
                 "/integrations/weather/test"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _req(port, path, "POST", {})
        assert e.value.code == 503, path


def test_import_validate(served, tmp_path):  # noqa: F811
    app, port = served
    log = tmp_path / "pi.csv"
    log.write_text(
        "Date;Time;Sci_Name;Com_Name;Confidence\n"
        "2024-05-01;04:12:00;Turdus merula;Eurasian Blackbird;0.91\n"
        "2024-05-01;04:15:00;Parus major;Great Tit;0.77\n")
    out = _req(port, "/imports/validate", "POST", {"path": str(log)})
    assert out["valid"] and out["detections"] == 2 and out["species"] == 2
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/imports/validate", "POST", {"path": "/nope.csv"})
    assert e.value.code == 400


def test_on_demand_clip_and_processing(served, tmp_path):  # noqa: F811
    app, port = served
    app.settings.export.path = str(tmp_path / "clips")
    # a detection whose audio is still in the capture buffer
    from tests.test_realtime_core import _src

    app.settings.export.pre_capture_seconds = 1.0
    app.settings.export.clip_length_seconds = 3.0
    now = time.time()
    app.engine.add_source(_src(sid="clipcam"))
    tone = (9000 * np.sin(np.arange(48000 * 8) / 10.0)).astype(np.int16)
    app.engine.ingest("clipcam", tone, timestamp=now - 8.0)
    det_id = app.datastore.insert_detection(
        _detection(ts=now - 5.0, source="clipcam"))
    out = _req(port, f"/audio/{det_id}/clip", "POST", {})
    assert out["status"] == "generated" and out["clip_name"]
    assert (tmp_path / "clips" / out["clip_name"]).is_file()
    # second call: already there
    assert _req(port, f"/audio/{det_id}/clip", "POST", {})["status"] \
        == "exists"
    # processing returns WAV with gain applied
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/audio/{det_id}/process",
        data=json.dumps({"gain_db": -6.0}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        wav = r.read()
    assert wav[:4] == b"RIFF"
    # a detection older than the ring: 410
    old_id = app.datastore.insert_detection(
        _detection(ts=now - 500.0, source="clipcam", sci="Old bird"))
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, f"/audio/{old_id}/clip", "POST", {})
    assert e.value.code == 410
    # unknown detection: 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/audio/999999/clip", "POST", {})
    assert e.value.code == 404


def test_taxonomy_genus_family_and_code_thumbnail(served):  # noqa: F811
    """Genus/family endpoints and code-addressed thumbnails (reference:
    taxonomy tree/family/genus + GET /species/:code/thumbnail)."""
    app, port = served
    # genus detail: species from the primary (synthetic) label set
    labels = next(iter(app.labels.values()))
    genus = labels.species[0].scientific.split(" ")[0]
    body = _req(port, f"/taxonomy/genus/{genus}")
    assert any(s["scientific_name"] == labels.species[0].scientific
               for s in body["species"])
    # family lookup works when genus_taxonomy.json is resolvable, and
    # 404s cleanly otherwise
    from birdnet_go_tpu.taxonomy.labels import load_genus_taxonomy

    if load_genus_taxonomy(None):
        fam = _req(port, "/taxonomy/family/Turdidae")
        assert "Turdus" in fam["genera"]
    else:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _req(port, "/taxonomy/family/Turdidae")
        assert exc.value.code == 404
    for path in ("/taxonomy/genus/Nosuchgenus",
                 "/taxonomy/family/Nosuchfamily",
                 "/species/xyz123/thumbnail"):    # synthetic: no codes
        with pytest.raises(urllib.error.HTTPError) as exc:
            _req(port, path)
        assert exc.value.code == 404, path


def test_metrics_history_endpoint(served):  # noqa: F811
    """Rolling resource samples appear after start (system metrics
    history)."""
    app, port = served
    body = _req(port, "/system/metrics/history")
    assert body["interval_seconds"] > 0
    assert len(body["samples"]) >= 1
    s = body["samples"][0]
    assert "time" in s and "memory_pct" in s


def test_sys_jobs_shed_order_and_bands(served):  # noqa: F811
    """/system/jobs carries the per-category ledger plus shed-order and
    band-depth forensics (round-4 priority jobqueue observability)."""
    app, port = served
    d = _req(port, "/system/jobs")
    assert "by_category" in d and "shed_order" in d
    assert isinstance(d["shed_order"], list)
    assert set(d["pending_by_band"]) == {"0", "1", "2"}
    # all production categories pre-seeded (race-free reader contract)
    for cat in ("database", "clip", "log", "mqtt", "alert"):
        assert cat in d["by_category"]

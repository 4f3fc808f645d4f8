"""App-level wiring of MQTT + notifications + species tracker + metrics."""

import json
import time
import urllib.request

import numpy as np
import pytest

from birdnet_go_tpu.integrations.mqtt import MiniBroker
from tests.test_app_integration import tiny_app  # fixture


def test_mqtt_and_new_species_notification(tiny_app, monkeypatch):
    app = tiny_app

    broker = MiniBroker()
    broker.start()
    app.settings.mqtt.enabled = True
    app.settings.mqtt.host = "127.0.0.1"
    app.settings.mqtt.port = broker.port

    # re-run the integration part of setup with mqtt enabled
    from birdnet_go_tpu.integrations.mqtt import MqttClient

    app.mqtt = MqttClient("127.0.0.1", broker.port, client_id="birdnet-tpu")

    sent_notifications = []

    class _FakeNotifications:
        def notify(self, n):
            sent_notifications.append(n)
            return 1

    app.notifications = _FakeNotifications()
    app.settings.notification.notify_new_species = True

    app.start(warmup=False)
    assert app.mqtt.wait_connected(5)

    # feed an approved detection through the real approval path
    from birdnet_go_tpu.analysis.processor import WindowPrediction

    now = time.time() - 100            # past deadline immediately
    app.processor.submit(WindowPrediction(
        source_id="s1", model_id="BirdNET_V2.4", start_time=now,
        end_time=now + 3, indices=[2], confidences=[0.95]))
    approved = app.processor.flush(now=now + 1000)
    assert approved

    deadline = time.time() + 10
    while time.time() < deadline:
        mqtt_msgs = [m for m in broker.messages
                     if m[0] == "birdnet/detections"]
        if mqtt_msgs and sent_notifications \
                and app.datastore.count_detections():
            break
        time.sleep(0.1)

    mqtt_msgs = [m for m in broker.messages if m[0] == "birdnet/detections"]
    assert mqtt_msgs, "detection never reached MQTT"
    body = json.loads(mqtt_msgs[0][1])
    assert "id" in body and body["confidence"] == 0.95
    assert sent_notifications and "first ever" in sent_notifications[0].message

    # second detection of the same species: no new notification
    n_before = len(sent_notifications)
    app.processor.submit(WindowPrediction(
        source_id="s1", model_id="BirdNET_V2.4", start_time=now + 50,
        end_time=now + 53, indices=[2], confidences=[0.9]))
    app.processor.flush(now=now + 10000)
    time.sleep(1.0)
    assert len(sent_notifications) == n_before
    app.stop()
    broker.stop()


def test_metrics_endpoint(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics",
                                timeout=5) as r:
        text = r.read().decode()
    assert "# TYPE birdnet_detections_approved_total gauge" in text
    assert "birdnet_jobqueue_enqueued_total" in text
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/system/errors", timeout=5) as r:
        assert isinstance(json.loads(r.read()), list)
    app.stop()


def test_species_tracker_basics():
    import datetime

    from birdnet_go_tpu.analysis.species_tracker import (
        SpeciesTracker,
        season_of,
    )

    assert season_of(datetime.date(2026, 1, 15)) == "winter"
    assert season_of(datetime.date(2026, 4, 15)) == "spring"
    tr = SpeciesTracker()
    d1 = datetime.date(2026, 5, 1)
    st = tr.observe("Turdus merula", d1)
    assert st.is_new_lifetime and st.is_new_this_year and st.is_new_this_season
    st = tr.observe("Turdus merula", datetime.date(2026, 5, 2))
    assert not st.is_new_lifetime and not st.is_new_this_year
    st = tr.observe("Turdus merula", datetime.date(2027, 1, 1))
    assert not st.is_new_lifetime and st.is_new_this_year
    fs = tr.first_seen("Turdus merula", d1)
    assert fs.lifetime == d1
    assert tr.species_count() == 1


def test_species_tracker_datastore_sync():
    from birdnet_go_tpu.analysis.species_tracker import SpeciesTracker
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    ds = Datastore(":memory:")
    ds.insert_detection(_detection())
    tr = SpeciesTracker(ds)
    assert tr.species_count() == 1
    import datetime

    st = tr.observe("Turdus merula", datetime.date.today())
    assert not st.is_new_lifetime


def test_control_signals_live_reconfigure(tiny_app):
    """Full control-bus surface: live source add/remove, model settings,
    dynamic thresholds, intervals, notifications (control_monitor.go)."""
    from birdnet_go_tpu.config.control import ControlSignal

    app = tiny_app

    def send(sig):
        app.control.send(sig)
        app.control.drain_sync()

    # live source reconfigure (reconfigure_rtsp_sources analogue)
    app.settings.realtime.sources = [{"type": "tone", "id": "t1"}]
    send(ControlSignal.RECONFIGURE_SOURCES)
    assert "t1" in app._source_cfgs
    assert any(s.source.source_id == "t1" for s in app._sources)
    app.settings.realtime.sources = [
        {"type": "tone", "id": "t1", "freq": 2000.0}]   # changed → replaced
    send(ControlSignal.RECONFIGURE_SOURCES)
    assert app._source_cfgs["t1"]["freq"] == 2000.0
    app.settings.realtime.sources = []
    send(ControlSignal.RECONFIGURE_SOURCES)
    assert "t1" not in app._source_cfgs
    assert app.engine.capture_buffer("t1") is None

    # per-model sensitivity applied to the running batcher
    app.settings.models[0].sensitivity = 1.2
    send(ControlSignal.RELOAD_THRESHOLDS)
    assert app.device_loop.batchers["BirdNET_V2.4"].sensitivity == 1.2

    # dynamic threshold knobs
    app.settings.dynamic_threshold.trigger = 0.8
    app.settings.dynamic_threshold.min = 0.3
    send(ControlSignal.RECONFIGURE_DYNAMIC_THRESHOLDS)
    assert app.processor.dynamic.trigger == 0.8
    assert app.processor.dynamic.floor == 0.3
    app.processor.dynamic.learn(0.95, "BirdNET_V2.4", "X")
    send(ControlSignal.RECALCULATE_DYNAMIC_THRESHOLDS)
    assert app.processor.dynamic.entries() == []

    # detection intervals + species config → event tracker
    app.settings.realtime.interval_seconds = 30.0
    app.settings.species.config["Parus major"] = {"interval": 99}
    send(ControlSignal.UPDATE_DETECTION_INTERVALS)
    assert app.event_tracker.default_interval == 30.0
    assert app.event_tracker.species_config["parus major"]["interval"] == 99

    # notifications rebuilt from settings
    app.settings.notification.targets = [
        {"name": "hook", "kind": "webhook", "url": "http://127.0.0.1:9/x"}]
    send(ControlSignal.RECONFIGURE_NOTIFICATIONS)
    assert len(app.notifications.targets) == 1
    # the alerting engine must be re-wired to the NEW service — it
    # captured the old one at construction and alert firings would
    # otherwise deliver to removed targets until restart
    assert app.alerting.notifications is app.notifications

    # alert rules rebuilt live from settings (PATCH /settings/alerting →
    # RECONFIGURE_ALERTING; previously the engine kept stale rules until
    # process restart)
    app.settings.alerting.rules = [
        {"rule_id": "r9", "species": ["Parus major"],
         "min_confidence": 0.5}]
    send(ControlSignal.RECONFIGURE_ALERTING)
    rules = app.alerting.list_rules()
    assert [r.rule_id for r in rules] == ["r9"]
    assert "{common_name}" in rules[0].message_template  # default kept
    app.settings.alerting.rules = []
    send(ControlSignal.RECONFIGURE_ALERTING)
    assert app.alerting.list_rules() == []


def test_settings_patch_emits_new_signals(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/settings/mqtt",
        data=json.dumps({"enabled": False}).encode(),
        headers={"Content-Type": "application/json"}, method="PATCH")
    with urllib.request.urlopen(req, timeout=5) as r:
        body = json.loads(r.read())
    assert body["signals"] == ["reconfigure_mqtt"]

    # daylight_filter PATCH re-resolves the exclusionary species filters
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/settings/daylight_filter",
        data=json.dumps({"enabled": True,
                         "species": ["Strix aluco"]}).encode(),
        headers={"Content-Type": "application/json"}, method="PATCH")
    with urllib.request.urlopen(req, timeout=5) as r:
        body = json.loads(r.read())
    assert body["signals"] == ["rebuild_extended_capture"]
    app.stop()

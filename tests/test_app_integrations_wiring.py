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

"""Integrations & cross-cutting infra: MQTT (real sockets against the
embedded broker), BirdWeather/weather/notifications (mock transport),
events bus, metrics, health, circuit breaker, disk manager."""

import json
import time

import numpy as np
import pytest

from birdnet_go_tpu.integrations.mqtt import (
    MiniBroker,
    MqttClient,
    ha_discovery_payloads,
    _topic_matches,
)
from birdnet_go_tpu.utils.circuit import CircuitBreaker, CircuitOpenError
from tests.test_app_integration import tiny_app  # noqa: F401 (fixture)
from birdnet_go_tpu.utils.diskmanager import DiskManager, RetentionPolicy
from birdnet_go_tpu.utils.events import Event, EventBus
from birdnet_go_tpu.utils.health import CheckResult, HealthRegistry
from birdnet_go_tpu.utils.metrics import MetricsRegistry


# -- MQTT ------------------------------------------------------------------------

@pytest.fixture()
def broker():
    b = MiniBroker()
    b.start()
    yield b
    b.stop()


def test_mqtt_publish_subscribe_roundtrip(broker):
    sub = MqttClient("127.0.0.1", broker.port, client_id="sub")
    sub.start()
    assert sub.wait_connected(5)
    got = []
    sub.subscribe("birdnet/detections", lambda t, p: got.append((t, p)))
    time.sleep(0.2)

    pub = MqttClient("127.0.0.1", broker.port, client_id="pub")
    pub.start()
    assert pub.wait_connected(5)
    assert pub.publish("birdnet/detections",
                       {"common_name": "Great Tit", "confidence": 0.92})
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        time.sleep(0.05)
    pub.stop()
    sub.stop()
    assert got, "subscriber never received the message"
    topic, payload = got[0]
    assert topic == "birdnet/detections"
    assert json.loads(payload)["common_name"] == "Great Tit"
    assert broker.messages[0][0] == "birdnet/detections"


def test_mqtt_qos1_puback(broker):
    pub = MqttClient("127.0.0.1", broker.port)
    pub.start()
    assert pub.wait_connected(5)
    assert pub.publish("a/b", b"x", qos=1)
    time.sleep(0.2)
    pub.stop()
    assert broker.messages == [("a/b", b"x")]


def test_mqtt_flapping_session_counts_toward_persistent_failure(monkeypatch):
    """connect-succeeds-then-read-loop-dies flapping (duplicate client id,
    broker killing the session after CONNACK) must accumulate consecutive
    errors and emit the tagged persistent-failure error — a short-lived
    'successful' connect must not reset the outage counter."""
    import birdnet_go_tpu.utils.errors as errors_mod

    c = MqttClient("127.0.0.1", 1, client_id="flap")
    monkeypatch.setattr(c, "_connect_once", lambda: None)

    def dead_read():
        raise ConnectionError("session killed after CONNACK")

    monkeypatch.setattr(c, "_read_loop", dead_read)
    laps = {"n": 0}

    def fast_wait(timeout=None):
        laps["n"] += 1
        if laps["n"] >= 8:
            c._stop.set()
        return c._stop.is_set()

    monkeypatch.setattr(c._stop, "wait", fast_wait)
    tagged = []
    monkeypatch.setattr(errors_mod, "from_exception",
                        lambda e, comp, cat=None: tagged.append(comp))
    c._run()
    assert c._consec_errors >= 5
    assert tagged == ["mqtt"]          # once per outage, at the 5th lap


def test_mqtt_slow_failing_connect_keeps_backing_off(monkeypatch):
    """A connect attempt that takes >=30 s to FAIL (dead DNS resolver
    blocking getaddrinfo) is not a recovered session: backoff must keep
    growing and consecutive errors must still reach the persistent-
    failure tag. Only a CONNECTED stretch >=30 s resets the counters."""
    import birdnet_go_tpu.integrations.mqtt as mqtt_mod
    import birdnet_go_tpu.utils.errors as errors_mod

    c = MqttClient("127.0.0.1", 1, client_id="slowfail")
    fake = {"t": 0.0}

    def fake_monotonic():
        fake["t"] += 31.0                 # every clock read jumps 31 s
        return fake["t"]

    monkeypatch.setattr(mqtt_mod.time, "monotonic", fake_monotonic)

    def slow_dead_connect():
        raise OSError("getaddrinfo blocked 40 s then failed")

    monkeypatch.setattr(c, "_connect_once", slow_dead_connect)
    laps = {"n": 0}
    backoffs = []

    def fast_wait(timeout=None):
        laps["n"] += 1
        backoffs.append(timeout)
        if laps["n"] >= 8:
            c._stop.set()
        return c._stop.is_set()

    monkeypatch.setattr(c._stop, "wait", fast_wait)
    tagged = []
    monkeypatch.setattr(errors_mod, "from_exception",
                        lambda e, comp, cat=None: tagged.append(comp))
    c._run()
    assert c._consec_errors >= 5
    assert tagged == ["mqtt"]
    assert backoffs == sorted(backoffs) and backoffs[-1] > 1.0


def test_topic_wildcards():
    assert _topic_matches("a/+/c", "a/b/c")
    assert not _topic_matches("a/+/c", "a/b/d")
    assert _topic_matches("a/#", "a/b/c/d")
    assert _topic_matches("#", "anything/at/all")
    assert not _topic_matches("a/b", "a/b/c")


def test_ha_discovery_payloads():
    p = ha_discovery_payloads()
    assert any("last_detection/config" in k for k in p)
    for cfg in p.values():
        assert "state_topic" in cfg and "device" in cfg


# -- events bus --------------------------------------------------------------------

def test_event_bus_delivery_and_dedup():
    bus = EventBus(dedup_window_seconds=10.0)
    got = []
    bus.subscribe("sink", lambda ev: got.append(ev))
    assert bus.publish(Event("detection", {"x": 1}, dedup_key="k1"))
    assert not bus.publish(Event("detection", {"x": 2}, dedup_key="k1"))
    assert bus.publish(Event("detection", {"x": 3}, dedup_key="k2"))
    deadline = time.time() + 5
    while len(got) < 2 and time.time() < deadline:
        time.sleep(0.02)
    bus.stop()
    assert [e.payload["x"] for e in got] == [1, 3]
    assert bus.deduped == 1


def test_event_bus_slow_consumer_drops():
    bus = EventBus(queue_size=2)
    bus.subscribe("slow", lambda ev: time.sleep(10))
    for i in range(10):
        bus.publish(Event("x", i))
    bus._stopped.set()                # fast teardown, skip join
    assert bus.dropped.get("slow", 0) > 0
    assert "slow" in bus.slow_consumers


# -- metrics ----------------------------------------------------------------------------

def test_metrics_render_prometheus_text():
    reg = MetricsRegistry()
    c = reg.counter("bn_detections_total", "Total detections")
    c.inc(labels={"model": "BirdNET_V2.4"})
    c.inc(2, labels={"model": "Perch_V2"})
    g = reg.gauge("bn_streams_active")
    g.set(42)
    h = reg.histogram("bn_latency_seconds", buckets=(0.1, 1.0))
    h.observe(0.05)
    h.observe(0.5)
    text = reg.render()
    assert "# TYPE bn_detections_total counter" in text
    assert 'bn_detections_total{model="BirdNET_V2.4"} 1' in text
    assert 'bn_detections_total{model="Perch_V2"} 2' in text
    assert "bn_streams_active 42" in text
    assert 'bn_latency_seconds_bucket{le="0.1"} 1' in text
    assert 'bn_latency_seconds_bucket{le="+Inf"} 2' in text
    assert "bn_latency_seconds_count 2" in text


# -- health -----------------------------------------------------------------------------

def test_health_registry():
    reg = HealthRegistry()
    reg.register("db", lambda: CheckResult("db", True, "ok"))
    reg.register("bad", lambda: 1 / 0)
    results = {r.name: r for r in reg.run_all()}
    assert results["db"].healthy
    assert not results["bad"].healthy
    assert "ZeroDivisionError" in results["bad"].detail
    assert not reg.overall()


# -- circuit breaker ----------------------------------------------------------------------

def test_circuit_breaker_opens_and_recovers():
    cb = CircuitBreaker(failure_threshold=2, cooldown_seconds=0.1)
    with pytest.raises(ValueError):
        cb.call(lambda: (_ for _ in ()).throw(ValueError("boom")))
    assert cb.state == "closed"
    with pytest.raises(ValueError):
        cb.call(lambda: (_ for _ in ()).throw(ValueError("boom")))
    assert cb.state == "open"
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: 42)
    time.sleep(0.12)
    assert cb.state == "half-open"
    assert cb.call(lambda: 42) == 42
    assert cb.state == "closed"


# -- notification service ---------------------------------------------------------------------

class _FakeResponse:
    status_code = 200

    def raise_for_status(self):
        pass

    def json(self):
        return {}


class _FakeSession:
    def __init__(self):
        self.requests = []

    def request(self, method, url, content=None, headers=None):
        self.requests.append((method, url, content, headers))
        return _FakeResponse()

    def get(self, url, **kw):
        self.requests.append(("GET", url, None, kw))
        return _FakeResponse()

    def post(self, url, **kw):
        self.requests.append(("POST", url, kw.get("content"), kw))
        return _FakeResponse()


def test_notification_webhook_template_and_rate_limit():
    from birdnet_go_tpu.integrations.notification import (
        Notification,
        NotificationService,
        NotificationTarget,
    )

    session = _FakeSession()
    svc = NotificationService([NotificationTarget(
        name="hook", kind="webhook", url="http://x/y",
        body_template='{"text": "$title: $common_name ($confidence)"}',
        min_interval_seconds=100.0)], session=session)
    n = Notification(title="New species", message="m",
                     payload={"common_name": "Great Tit",
                              "confidence": 0.93})
    assert svc.notify(n) == 1
    body = session.requests[0][2].decode()
    assert "Great Tit" in body and "0.93" in body
    # rate limited second send
    assert svc.notify(n) == 0
    assert svc.suppressed == 1


def test_notification_burst_protection():
    from birdnet_go_tpu.integrations.notification import (
        Notification,
        NotificationService,
        NotificationTarget,
    )

    svc = NotificationService([NotificationTarget(
        name="hook", kind="webhook", url="http://x")],
        session=_FakeSession(), burst_limit=3, burst_window_seconds=60)
    n = Notification(title="t", message="m")
    sent = sum(svc.notify(n) for _ in range(6))
    assert sent == 3
    assert svc.suppressed == 3


# -- birdweather / weather ----------------------------------------------------------------------

def test_birdweather_upload_and_detection():
    from birdnet_go_tpu.integrations.birdweather import (
        BirdWeatherClient,
        BirdWeatherConfig,
    )

    class _BwSession(_FakeSession):
        def post(self, url, content=None, json=None, headers=None):
            self.requests.append(("POST", url, content or json, headers))
            r = _FakeResponse()
            r.json = lambda: {"soundscape": {"id": 77}}
            return r

    session = _BwSession()
    client = BirdWeatherClient(BirdWeatherConfig(
        station_token="tok123", latitude=60.0, longitude=24.0),
        session=session)
    pcm = (np.sin(np.linspace(0, 1000, 48000 * 3))
           * 1000).astype(np.int16)
    sid = client.upload_soundscape(pcm, 48000, "2026-08-16T12:00:00Z")
    assert sid == 77
    assert "stations/tok123/soundscapes" in session.requests[0][1]
    # uploaded WAV is normalized: decode and check gain applied
    import io

    from birdnet_go_tpu.audio.wav import read_wav

    y, info = read_wav(io.BytesIO(session.requests[0][2]))
    assert info.sample_rate == 48000
    assert np.abs(y).max() > np.abs(pcm).max() / 32768.0   # gained toward -23 LUFS

    from tests.test_realtime_core import _detection

    assert client.post_detection(_detection(), sid, "2026-08-16T12:00:00Z")
    assert "detections" in session.requests[1][1]


def test_weather_yrno_parse_and_poll():
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from birdnet_go_tpu.integrations.weather import WeatherPoller, YrNoProvider

    class _YrSession(_FakeSession):
        def get(self, url, params=None, headers=None):
            assert "User-Agent" in headers        # met.no requires it
            r = _FakeResponse()
            r.json = lambda: {"properties": {"timeseries": [{
                "time": "2026-08-16T12:00:00Z",
                "data": {"instant": {"details": {
                    "air_temperature": 18.5, "relative_humidity": 72.0,
                    "wind_speed": 3.2}},
                    "next_1_hours": {"summary": {"symbol_code": "cloudy"}}},
            }]}}
            return r

    provider = YrNoProvider(60.17, 24.94, session=_YrSession())
    ds = Datastore(":memory:")
    poller = WeatherPoller(provider, ds)
    assert poller.poll_once() == 1
    rows = ds.get_hourly_weather("2026-08-16")
    assert rows and rows[0]["temperature"] == 18.5
    assert rows[0]["description"] == "cloudy"
    assert rows[0]["icon"] == "04"          # standardized code persisted


def test_weather_icon_code_tables():
    """Standardized icon mapping (icon_codes_test.go:
    TestYrNoSymbolToIcon_Coverage / TestOpenWeatherToIcon_DayNightParity
    / TestGetStandardIconCode_UnknownCode)."""
    from birdnet_go_tpu.integrations.weather import (
        ICON_DESCRIPTION,
        ICON_UNKNOWN,
        infer_wunderground_icon,
        openweather_icon,
        yrno_symbol_icon,
    )

    cases = {
        "clearsky_day": "01", "clearsky_night": "01",
        "clearsky_polartwilight": "01",
        "fair_day": "02", "partlycloudy_night": "03", "cloudy": "04",
        "fog": "50",
        "lightrainshowers_day": "09", "heavyrainshowers_night": "09",
        "lightrain": "10", "rain": "10", "heavyrain": "10",
        "rainshowersandthunder_day": "11", "heavyrainandthunder": "11",
        # yr.no's own typo'd symbols still resolve
        "lightssleetshowersandthunder_day": "11",
        "lightssnowshowersandthunder_night": "11",
        "lightsleet": "12", "heavysleetshowers_polartwilight": "12",
        "snow": "13", "heavysnowshowers_day": "13",
        "snowandthunder": "11",
        "": "unknown", "martian_dust": "unknown",
    }
    for symbol, want in cases.items():
        assert yrno_symbol_icon(symbol) == want, symbol
    # day/night parity + passthrough of the numeric part
    for num in ("01", "02", "03", "04", "09", "10", "11", "13", "50"):
        assert openweather_icon(num + "d") == num
        assert openweather_icon(num + "n") == num
    assert openweather_icon("99x") == ICON_UNKNOWN
    # every mapped code has a description
    for symbol in cases.values():
        assert symbol in ICON_DESCRIPTION
    # measurement inference (InferWundergroundIcon thresholds)
    assert infer_wunderground_icon(20, 12, 50, 400, 20) == "11"  # storm
    assert infer_wunderground_icon(-3, 1, 80, 10, 2) == "13"     # snow
    assert infer_wunderground_icon(10, 1, 80, 10, 2) == "10"     # rain
    assert infer_wunderground_icon(2, None, 95, 1, 0) == "50"    # fog
    assert infer_wunderground_icon(15, 0, 90, 1, 0) == "04"      # night hum
    assert infer_wunderground_icon(15, 0, 70, 1, 0) == "03"
    assert infer_wunderground_icon(15, 0, 40, 1, 0) == "01"
    assert infer_wunderground_icon(25, 0, 40, 700, 0) == "01"    # day SR
    assert infer_wunderground_icon(25, 0, 40, 300, 0) == "03"
    assert infer_wunderground_icon(25, 0, 40, 100, 0) == "04"


# -- disk manager ------------------------------------------------------------------------------------

def test_diskmanager_age_policy_and_locked_spared(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    old = tmp_path / "old.wav"
    new = tmp_path / "new.wav"
    locked = tmp_path / "locked.wav"
    for p in (old, new, locked):
        p.write_bytes(b"RIFF")
    t_old = time.time() - 40 * 86400
    import os

    os.utime(old, (t_old, t_old))
    os.utime(locked, (t_old, t_old))

    ds = Datastore(":memory:")
    det_id = ds.insert_detection(_detection(), clip_name="locked.wav")
    ds.lock_detection(det_id)

    dm = DiskManager(tmp_path, RetentionPolicy(mode="age", max_age_days=30),
                     datastore=ds)
    res = dm.cleanup()
    assert res.deleted == 1
    assert res.spared_locked == 1
    assert not old.exists() and new.exists() and locked.exists()


def test_diskmanager_reconcile(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    (tmp_path / "orphan.wav").write_bytes(b"RIFF")
    ds = Datastore(":memory:")
    ds.insert_detection(_detection(), clip_name="missing.wav")
    dm = DiskManager(tmp_path, RetentionPolicy(), datastore=ds)
    rec = dm.reconcile()
    assert rec["orphan_files"] == ["orphan.wav"]
    assert rec["missing_files"] == ["missing.wav"]


def test_diskmanager_nested_year_month_layout(tmp_path):
    """Clips nest under year/month (buildClipPath layout): retention
    scans recursively, locked protection matches the DB's RELATIVE
    clip_name, and reconcile reports relative paths."""
    import os
    import time

    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    sub = tmp_path / "2026" / "03"
    sub.mkdir(parents=True)
    old = sub / "old.wav"
    locked = sub / "locked.flac"
    old.write_bytes(b"RIFF")
    locked.write_bytes(b"fLaC")
    t_old = time.time() - 40 * 86400
    os.utime(old, (t_old, t_old))
    os.utime(locked, (t_old, t_old))

    ds = Datastore(":memory:")
    det_id = ds.insert_detection(_detection(),
                                 clip_name="2026/03/locked.flac")
    ds.lock_detection(det_id)
    ds.insert_detection(_detection(), clip_name="2026/04/missing.wav")

    dm = DiskManager(tmp_path, RetentionPolicy(mode="age", max_age_days=30),
                     datastore=ds)
    res = dm.cleanup()
    assert res.deleted == 1 and res.spared_locked == 1
    assert not old.exists() and locked.exists()
    rec = dm.reconcile()
    assert rec["orphan_files"] == []           # locked.flac has a DB row
    assert rec["missing_files"] == ["2026/04/missing.wav"]


def test_reconcile_orphans_pass_guards(tmp_path):
    """clip_reconcile.go contract: clears dangling clip_name refs only
    with positive evidence storage is attached; all-orphan chunks,
    missing base dirs, and recent rows never clear anything; pagination
    covers every chunk. Files are NEVER deleted."""
    import time

    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    old_ts = time.time() - 3600

    def seed(ds, n_present, n_ghost, ts=None):
        ids = []
        for i in range(n_present):
            name = f"2026/01/present{i}.wav"
            f = tmp_path / name
            f.parent.mkdir(parents=True, exist_ok=True)
            f.write_bytes(b"RIFF")
            ids.append(ds.insert_detection(
                _detection(ts=ts or old_ts), clip_name=name))
        for i in range(n_ghost):
            ids.append(ds.insert_detection(
                _detection(ts=ts or old_ts),
                clip_name=f"2026/01/ghost{i}.wav"))
        return ids

    # positive-evidence pass: ghosts cleared, present refs kept
    ds = Datastore(":memory:")
    seed(ds, n_present=2, n_ghost=3)
    dm = DiskManager(tmp_path, RetentionPolicy(), datastore=ds)
    res = dm.reconcile_orphans_pass()
    assert not res["aborted"] and res["cleared"] == 3
    refs = ds.get_clip_references()
    assert len(refs) == 2                       # ghosts now empty
    assert all("present" in r["clip_name"] for r in refs)
    assert (tmp_path / "2026/01/present0.wav").exists()

    # detached-storage guard: ALL rows orphan → abort, nothing cleared
    ds2 = Datastore(":memory:")
    seed(ds2, n_present=0, n_ghost=5)
    dm2 = DiskManager(tmp_path, RetentionPolicy(), datastore=ds2)
    res2 = dm2.reconcile_orphans_pass()
    assert res2["aborted"] and "all-orphan" in res2["abort_reason"]
    assert len(ds2.get_clip_references()) == 5

    # recency guard: a fresh ghost (encoder may still be writing) stays
    ds3 = Datastore(":memory:")
    seed(ds3, n_present=1, n_ghost=0)
    ds3.insert_detection(_detection(ts=time.time()),
                         clip_name="2026/01/encoding.wav")
    dm3 = DiskManager(tmp_path, RetentionPolicy(), datastore=ds3)
    res3 = dm3.reconcile_orphans_pass()
    assert res3["cleared"] == 0 and not res3["aborted"]

    # directory-present guard
    dm4 = DiskManager(tmp_path / "unmounted", RetentionPolicy(),
                      datastore=ds)
    res4 = dm4.reconcile_orphans_pass()
    assert res4["aborted"] and "unavailable" in res4["abort_reason"]

    # keyset pagination across chunks (every chunk holds positive
    # evidence, so the walk completes and clears all ghosts)
    ds5 = Datastore(":memory:")
    for i in range(12):
        if i % 3 == 0:
            name = f"2026/02/p{i}.wav"
            f = tmp_path / name
            f.parent.mkdir(parents=True, exist_ok=True)
            f.write_bytes(b"RIFF")
        else:
            name = f"2026/02/g{i}.wav"
        ds5.insert_detection(_detection(ts=old_ts), clip_name=name)
    dm5 = DiskManager(tmp_path, RetentionPolicy(), datastore=ds5)
    dm5.RECONCILE_CHUNK = 4
    res5 = dm5.reconcile_orphans_pass()
    assert not res5["aborted"]
    assert res5["scanned"] == 12 and res5["cleared"] == 8


def test_media_endpoints_serve_nested_clip_paths(tiny_app):
    """/audio/:id and /media/* resolve year/month-nested clip names;
    traversal outside the clip dir stays rejected."""
    import urllib.error
    import urllib.request
    from pathlib import Path

    import numpy as np
    import pytest

    from birdnet_go_tpu.audio.wav import write_wav
    from tests.test_realtime_core import _detection

    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    clips = Path(app.settings.export.path) / "2026" / "03"
    clips.mkdir(parents=True, exist_ok=True)
    t = np.arange(24000) / 48000.0
    write_wav(clips / "nested.wav",
              (0.4 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32), 48000)
    det_id = app.datastore.insert_detection(
        _detection(), clip_name="2026/03/nested.wav")

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/audio/{det_id}",
            timeout=10) as r:
        assert r.read()[:4] == b"RIFF"
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/media/audio/2026/03/nested.wav",
            timeout=10) as r:
        assert r.read()[:4] == b"RIFF"
    # percent-encoded separators (encodeURIComponent) also resolve
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/media/audio/"
            "2026%2F03%2Fnested.wav", timeout=10) as r:
        assert r.read()[:4] == b"RIFF"
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/media/audio/"
            "2026/03/../../../../etc/passwd", timeout=10)
    assert e.value.code == 404
    app.stop()


def test_notification_inbox_persists_across_restart(tmp_path):
    """Inbox entries write through to the datastore and the inbox is
    rehydrated from active history at startup; expired history is pruned
    (reference: SaveNotificationHistory / GetActiveNotificationHistory /
    DeleteExpiredNotificationHistory, datastore/interfaces.go)."""
    import time as _time

    from birdnet_go_tpu.datastore.sqlite import Datastore
    from birdnet_go_tpu.integrations.notification import (
        Notification,
        NotificationInbox,
    )

    db = tmp_path / "notif.db"
    ds = Datastore(db)
    inbox = NotificationInbox(store=ds)
    a = inbox.add(Notification(title="first", message="m1",
                               payload={"k": "v"}))
    b = inbox.add(Notification(title="second", message="m2",
                               priority="high"))
    assert inbox.mark_read(a.id)
    ds.close()

    # restart: rehydrate from the same database
    ds2 = Datastore(db)
    inbox2 = NotificationInbox(store=ds2)
    items = inbox2.list()
    assert [n["title"] for n in items] == ["second", "first"]
    assert inbox2.unread_count() == 1
    by_id = {n["id"]: n for n in items}
    assert by_id[a.id]["read"] is True
    assert by_id[a.id]["payload"] == {"k": "v"}
    # ids keep increasing after rehydrate (no collisions)
    c = inbox2.add(Notification(title="third", message="m3"))
    assert c.id > b.id
    # write-through delete + mark-all survive another restart
    assert inbox2.delete(b.id)
    inbox2.mark_all_read()
    ds2.close()

    ds3 = Datastore(db)
    inbox3 = NotificationInbox(store=ds3)
    assert {n["title"] for n in inbox3.list()} == {"first", "third"}
    assert inbox3.unread_count() == 0
    ds3.close()

    # TTL prune: entries older than the TTL are dropped at rehydrate
    ds4 = Datastore(db)
    ds4.save_notification("ancient", "old", "low",
                          _time.time() - 30 * 86400)
    inbox4 = NotificationInbox(store=ds4, ttl_seconds=7 * 86400)
    assert all(n["title"] != "ancient" for n in inbox4.list())
    ds4.close()

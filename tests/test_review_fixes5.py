"""Regression tests for the fourth self-review batch: MQTT status
property, PATCH /settings/models list rebuild, env-override typing for
None-default fields, ntfy priority mapping, metrics middleware on
cancellation, telemetry dedup bound, and imageprovider dataset hygiene."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from tests.test_app_integration import tiny_app  # noqa: F401 (fixture)
from tests.test_api_ext import _req, served  # noqa: F401 (fixture)


def test_mqtt_status_endpoint_with_client(served):  # noqa: F811
    """is_connected is a property — the status endpoint must not call it
    (TypeError: 'bool' object is not callable → 500)."""
    app, port = served
    from birdnet_go_tpu.integrations.mqtt import MqttClient

    app.mqtt = MqttClient("127.0.0.1", port=1)     # never connected
    try:
        out = _req(port, "/integrations/mqtt/status")
        assert out["connected"] is False
    finally:
        app.mqtt = None


def test_patch_settings_models_rebuilds_dataclasses(served):  # noqa: F811
    app, port = served
    from birdnet_go_tpu.config.settings import ModelSettings

    out = _req(port, "/settings/models", "PATCH",
               [{"model_id": "BirdNET_V2.4", "threshold": 0.42}])
    assert "warnings" in out or out  # endpoint responded 200
    assert all(isinstance(m, ModelSettings) for m in app.settings.models)
    assert app.settings.models[0].threshold == 0.42
    # validate() keeps working on the rebuilt list
    app.settings.validate()
    # a dict body for the models section is a 400, not a corruption
    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(port, "/settings/models", "PATCH", {"threshold": 0.5})
    assert ei.value.code == 400
    assert all(isinstance(m, ModelSettings) for m in app.settings.models)


def test_env_override_typing(monkeypatch):
    """None-default fields coerce by ANNOTATION: secrets stay strings even
    when numeric-looking; latitude/longitude still become floats."""
    from birdnet_go_tpu.config.settings import Settings, _apply_env_overrides

    s = Settings()
    _apply_env_overrides(s, {
        "BIRDNET_TPU_WEBSERVER__PASSWORD": "12345",
        "BIRDNET_TPU_WEBSERVER__AUTH_TOKEN": "98.5",
        "BIRDNET_TPU_LOCATION__LATITUDE": "60.17",
    })
    assert s.webserver.password == "12345"
    assert s.webserver.auth_token == "98.5"
    assert s.location.latitude == pytest.approx(60.17)


def test_ntfy_priority_header_mapped():
    """ntfy only accepts 1-5/min/low/default/high/max/urgent — 'normal'
    and 'critical' must map onto its scale."""
    from birdnet_go_tpu.integrations.notification import (
        Notification,
        NotificationService,
        NotificationTarget,
    )
    from tests.test_integrations import _FakeSession

    session = _FakeSession()
    svc = NotificationService([NotificationTarget(
        name="n", kind="ntfy", url="http://ntfy/topic")], session=session)
    svc.notify(Notification(title="t", message="m", priority="critical"))
    _, _, _, headers = session.requests[0]
    assert headers["Priority"] == "5"
    svc.notify(Notification(title="t2", message="m2"))
    assert session.requests[1][3]["Priority"] == "3"


def test_metrics_middleware_survives_cancellation():
    import asyncio

    from aiohttp import web

    from birdnet_go_tpu.api.security import http_metrics_middleware

    class _Route:
        resource = None

    class _MatchInfo:
        route = _Route()

    class _Req:
        method = "GET"
        match_info = _MatchInfo()

    async def handler(request):
        raise asyncio.CancelledError()

    async def run():
        with pytest.raises(asyncio.CancelledError):
            await http_metrics_middleware(_Req(), handler)

    asyncio.new_event_loop().run_until_complete(run())


def test_telemetry_dedup_bounded():
    from birdnet_go_tpu.utils import telemetry as tm

    w = tm._TelemetryWorker.__new__(tm._TelemetryWorker)
    import queue
    import threading

    w._seen = {}
    w._seen_lock = threading.Lock()
    w._queue = queue.Queue(maxsize=1)     # drop almost everything
    w.deduplicated = 0
    w.dropped = 0

    class _E:
        component = "c"
        category = "g"

        def __init__(self, i):
            self.i = i

        def __str__(self):
            return f"error variant {self.i}"

    for i in range(6000):
        w.capture(_E(i))
    assert len(w._seen) <= 4200


def test_avicommons_requires_code():
    from birdnet_go_tpu.integrations.imageprovider import AvicommonsProvider

    p = AvicommonsProvider.__new__(AvicommonsProvider)
    p.size = 320
    p._by_sci = {}
    n = p.load_dataset(json.dumps([
        {"sciName": "Parus major", "key": "k1", "code": "grtit1"},
        {"sciName": "Turdus merula", "key": "k2"},      # no code: skip
    ]))
    assert n == 1
    assert p.fetch("Parus major") is not None
    assert p.fetch("Turdus merula") is None

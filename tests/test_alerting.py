"""Alerting rules engine + API."""

import json
import urllib.request

import pytest

from birdnet_go_tpu.analysis.alerting import AlertingEngine, AlertRule
from tests.test_app_integration import tiny_app  # fixture

DET = {"scientific_name": "Strix aluco", "common_name": "Tawny Owl",
       "confidence": 0.92, "source_id": "garden"}


def make_engine(**kw):
    clock = {"t": 10_000.0}
    eng = AlertingEngine(clock=lambda: clock["t"], **kw)
    return eng, clock


def test_rule_matching_conditions():
    eng, _ = make_engine()
    r = AlertRule(rule_id="r1", name="owls", species=["Strix *"],
                  min_confidence=0.8, sources=["garden"])
    eng.add_rule(r)
    assert eng.matches(r, DET)
    assert not eng.matches(r, {**DET, "confidence": 0.5})
    assert not eng.matches(r, {**DET, "scientific_name": "Parus major",
                               "common_name": "Great Tit"})
    assert not eng.matches(r, {**DET, "source_id": "roof"})
    # common-name glob also matches
    r2 = AlertRule(rule_id="r2", name="owls2", species=["*Owl*"])
    assert eng.matches(r2, DET)


def test_rule_firing_throttle_and_history():
    eng, clock = make_engine()
    eng.add_rule(AlertRule(rule_id="r1", name="any", min_interval_seconds=60,
                           message_template="{common_name} at {confidence}"))
    fired = eng.on_detection(DET)
    assert len(fired) == 1
    assert "Tawny Owl" in fired[0].message
    assert eng.on_detection(DET) == []          # throttled
    clock["t"] += 61
    assert len(eng.on_detection(DET)) == 1
    assert len(eng.history) == 2


def test_only_new_species_and_window():
    eng, clock = make_engine()
    eng.add_rule(AlertRule(rule_id="new", name="new species",
                           only_new_species=True, min_interval_seconds=0))
    assert eng.on_detection(DET, is_new_species=False) == []
    assert len(eng.on_detection(DET, is_new_species=True)) == 1

    import datetime

    eng2, clock2 = make_engine()
    # choose a window excluding the current clock time
    now_t = datetime.datetime.fromtimestamp(clock2["t"]).time()
    excl = "03:00-03:01" if now_t.hour != 3 else "05:00-05:01"
    eng2.add_rule(AlertRule(rule_id="w", name="windowed",
                            active_window=excl, min_interval_seconds=0))
    assert eng2.on_detection(DET) == []


def test_rule_fires_notification():
    sent = []

    class _Svc:
        def notify(self, n):
            sent.append(n)
            return 1

    eng, _ = make_engine(notification_service=_Svc())
    eng.add_rule(AlertRule(rule_id="r", name="owl alert", priority="high"))
    eng.on_detection(DET)
    assert sent and sent[0].priority == "high"
    assert "owl alert" in sent[0].title


def test_alert_api(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    base = f"http://127.0.0.1:{port}/api/v2"

    def req(method, path, body=None):
        r = urllib.request.Request(
            base + path,
            data=json.dumps(body).encode() if body is not None else None,
            headers={"Content-Type": "application/json"}, method=method)
        try:
            with urllib.request.urlopen(r, timeout=5) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, {}

    code, body = req("POST", "/alerts/rules", {
        "rule_id": "owls", "name": "Owls", "species": ["Strix *"],
        "min_confidence": 0.5})
    assert code == 200 and body["created"] == "owls"
    code, rules = req("GET", "/alerts/rules")
    assert len(rules) == 1 and rules[0]["rule_id"] == "owls"
    code, t = req("POST", "/alerts/rules/owls/test",
                  {"scientific_name": "Strix aluco", "common_name": "x",
                   "confidence": 0.9})
    assert t["matched"] is True
    code, t = req("POST", "/alerts/rules/owls/test",
                  {"scientific_name": "Parus major", "common_name": "x",
                   "confidence": 0.9})
    assert t["matched"] is False
    code, _ = req("DELETE", "/alerts/rules/owls")
    assert code == 200
    code, _ = req("DELETE", "/alerts/rules/owls")
    assert code == 404
    # bad rule body → 400
    code, _ = req("POST", "/alerts/rules", {"rule_id": "x", "name": "x",
                                            "bogus_field": 1})
    assert code == 400
    app.stop()

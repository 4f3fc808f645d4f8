"""Alerting rules engine.

Reference: internal/alerting (2.8k LoC) — user-defined rules with
conditions (species match, confidence floor, time windows, sources,
novelty) and schedules, fed by detection events off the event bus, firing
through the notification dispatcher with per-rule rate limits; rule test
endpoint + firing history.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import fnmatch
import logging
import threading
import time
from typing import Any

log = logging.getLogger("birdnet_tpu.alerting")


@dataclasses.dataclass
class AlertRule:
    rule_id: str
    name: str
    enabled: bool = True
    # conditions (all must hold)
    species: list[str] = dataclasses.field(default_factory=list)
    # glob patterns against scientific or common name; empty = any species
    min_confidence: float = 0.0
    sources: list[str] = dataclasses.field(default_factory=list)
    only_new_species: bool = False
    # active window "HH:MM-HH:MM" local, empty = always
    active_window: str = ""
    # throttle
    min_interval_seconds: float = 300.0
    # action
    priority: str = "normal"
    message_template: str = "{common_name} detected ({confidence:.0%})"


@dataclasses.dataclass
class AlertEvent:
    rule_id: str
    fired_at: float
    message: str
    detection: dict[str, Any]


class AlertingEngine:
    def __init__(self, notification_service=None,
                 clock=time.time):
        self.rules: dict[str, AlertRule] = {}
        self.notifications = notification_service
        self.clock = clock
        self.history: list[AlertEvent] = []
        self._last_fired: dict[str, float] = {}
        self._lock = threading.Lock()

    # -- rule management ---------------------------------------------------------

    def add_rule(self, rule: AlertRule) -> None:
        with self._lock:
            self.rules[rule.rule_id] = rule

    def remove_rule(self, rule_id: str) -> bool:
        with self._lock:
            return self.rules.pop(rule_id, None) is not None

    def replace_rules(self, rules: list[AlertRule]) -> None:
        """Atomic swap used by the settings hot-reload path; throttle
        state (_last_fired) survives so edits don't re-fire alerts."""
        with self._lock:
            self.rules = {r.rule_id: r for r in rules}

    def list_rules(self) -> list[AlertRule]:
        with self._lock:
            return list(self.rules.values())

    # -- evaluation -----------------------------------------------------------------

    def matches(self, rule: AlertRule, detection: dict[str, Any],
                is_new_species: bool = False,
                now: float | None = None) -> bool:
        if not rule.enabled:
            return False
        if detection.get("confidence", 0.0) < rule.min_confidence:
            return False
        if rule.species:
            sci = detection.get("scientific_name", "")
            com = detection.get("common_name", "")
            if not any(fnmatch.fnmatch(sci, pat) or fnmatch.fnmatch(com, pat)
                       for pat in rule.species):
                return False
        if rule.sources and detection.get("source_id") not in rule.sources:
            return False
        if rule.only_new_species and not is_new_species:
            return False
        if rule.active_window:
            start_s, _, end_s = rule.active_window.partition("-")
            try:
                t = _dt.datetime.fromtimestamp(
                    now or self.clock()).time()
                sh, sm = map(int, start_s.strip().split(":"))
                eh, em = map(int, end_s.strip().split(":"))
                start, end = _dt.time(sh, sm), _dt.time(eh, em)
            except ValueError:
                return False
            inside = (start <= t < end) if start <= end \
                else (t >= start or t < end)
            if not inside:
                return False
        return True

    def on_detection(self, detection: dict[str, Any],
                     is_new_species: bool = False) -> list[AlertEvent]:
        """Evaluate every rule against a detection; fire matching ones."""
        now = self.clock()
        fired = []
        with self._lock:
            rules = list(self.rules.values())
        for rule in rules:
            if not self.matches(rule, detection, is_new_species, now):
                continue
            with self._lock:
                last = self._last_fired.get(rule.rule_id)
                if last is not None \
                        and now - last < rule.min_interval_seconds:
                    continue
                self._last_fired[rule.rule_id] = now
            try:
                msg = rule.message_template.format(**detection)
            except (KeyError, ValueError):
                msg = rule.message_template
            ev = AlertEvent(rule_id=rule.rule_id, fired_at=now,
                            message=msg, detection=dict(detection))
            with self._lock:
                self.history.append(ev)
                if len(self.history) > 500:
                    self.history = self.history[-500:]
            fired.append(ev)
            if self.notifications is not None:
                from birdnet_go_tpu.integrations.notification import (
                    Notification,
                )

                self.notifications.notify(Notification(
                    title=f"Alert: {rule.name}", message=msg,
                    priority=rule.priority, payload=detection))
        return fired

    def test_rule(self, rule_id: str,
                  sample: dict[str, Any] | None = None) -> bool:
        """Rule test endpoint: evaluate against a sample without firing."""
        with self._lock:
            rule = self.rules.get(rule_id)
        if rule is None:
            raise KeyError(rule_id)
        sample = sample or {
            "scientific_name": "Turdus merula",
            "common_name": "Eurasian Blackbird",
            "confidence": 0.95, "source_id": "test",
        }
        return self.matches(rule, sample, is_new_species=True)

"""Per-(species, action) rate limiting.

Reference: internal/analysis/processor/eventtracker.go:16-146 — suppresses
repeated actions for the same species within a configurable interval
(default 15 s realtime log interval, defaults.go:117; per-species override
via species config "interval").
"""

from __future__ import annotations

import threading


class EventTracker:
    def __init__(self, default_interval_seconds: float = 15.0,
                 per_species: dict[str, float] | None = None):
        self.default_interval = default_interval_seconds
        self.per_species = per_species or {}
        self._last: dict[tuple[str, str], float] = {}
        self._lock = threading.Lock()

    def should_act(self, species: str, action_kind: str, now: float) -> bool:
        """True (and records the event) if the interval has elapsed."""
        interval = self.per_species.get(species, self.default_interval)
        key = (species, action_kind)
        with self._lock:
            last = self._last.get(key)
            if last is not None and now - last < interval:
                return False
            self._last[key] = now
            return True

    def reset(self) -> None:
        with self._lock:
            self._last.clear()

"""Dynamic per-(model, species) confidence thresholds.

Reference: internal/analysis/processor/dynamic_threshold.go:49-518 —
repeated approved detections above the trigger confidence (default 0.90)
progressively lower that species' threshold through levels 1-3
(multipliers 0.75/0.5/0.25 of the base threshold, floored at `min`,
default 0.20); the lowered threshold expires after `valid_hours` without
new high-confidence detections and decays back level by level. State is
persisted (threshold_persistence.go) and restored at startup.
"""

from __future__ import annotations

import dataclasses
import threading
import time

_LEVEL_MULTIPLIER = {0: 1.0, 1: 0.75, 2: 0.5, 3: 0.25}
_MAX_LEVEL = 3


@dataclasses.dataclass
class ThresholdState:
    level: int = 0
    high_conf_count: int = 0
    expires_at: float = 0.0         # unix time; 0 = never armed

    def current_multiplier(self) -> float:
        return _LEVEL_MULTIPLIER[self.level]


class DynamicThresholds:
    """Thread-safe learned-threshold store keyed (model_id, scientific)."""

    def __init__(self, trigger: float = 0.90, floor: float = 0.20,
                 valid_hours: float = 24.0):
        self.trigger = trigger
        self.floor = floor
        self.valid_seconds = valid_hours * 3600.0
        self._state: dict[tuple[str, str], ThresholdState] = {}
        self._lock = threading.Lock()

    def adjust(self, base_threshold: float, model_id: str, scientific: str,
               now: float | None = None) -> float:
        """Effective threshold for a species (expiry applied lazily)."""
        now = time.time() if now is None else now
        with self._lock:
            st = self._state.get((model_id, scientific))
            if st is None or st.level == 0:
                return base_threshold
            if now > st.expires_at:
                # decay one level per expiry period elapsed
                periods = int((now - st.expires_at) // self.valid_seconds) + 1
                st.level = max(0, st.level - periods)
                st.expires_at = now + self.valid_seconds
                if st.level == 0:
                    del self._state[(model_id, scientific)]
                    return base_threshold
            return max(self.floor, base_threshold * st.current_multiplier())

    def learn(self, confidence: float, model_id: str, scientific: str,
              now: float | None = None) -> None:
        """LearnFromApprovedDetection: high-confidence approvals raise the
        level (up to 3) and refresh expiry."""
        if confidence < self.trigger:
            return
        now = time.time() if now is None else now
        with self._lock:
            st = self._state.setdefault((model_id, scientific),
                                        ThresholdState())
            st.high_conf_count += 1
            st.level = min(_MAX_LEVEL, st.level + 1)
            st.expires_at = now + self.valid_seconds

    def snapshot(self) -> dict[tuple[str, str], ThresholdState]:
        with self._lock:
            return {k: dataclasses.replace(v) for k, v in self._state.items()}

    def restore(self, state: dict[tuple[str, str], ThresholdState]) -> None:
        with self._lock:
            self._state = {k: dataclasses.replace(v)
                           for k, v in state.items()}

    def clear(self, model_id: str | None = None,
              scientific: str | None = None) -> int:
        """Remove learned state (API: DELETE /dynamic-thresholds[/:species])."""
        with self._lock:
            keys = [k for k in self._state
                    if (model_id is None or k[0] == model_id)
                    and (scientific is None or k[1] == scientific)]
            for k in keys:
                del self._state[k]
            return len(keys)

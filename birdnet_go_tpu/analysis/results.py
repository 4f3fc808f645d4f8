"""Detection result types (reference: internal/detection/result.go:12,
internal/datastore/model.go Note).

Transport-agnostic: produced by offline analysis and the realtime
processor, consumed by the Raven writer, datastore, API, and actions.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt

from birdnet_go_tpu.taxonomy.labels import Species


@dataclasses.dataclass
class WindowResult:
    """All per-window model output kept after device post-processing:
    top-K (species index, confidence) pairs for one analysis window."""

    window_index: int
    begin_seconds: float
    end_seconds: float
    model_id: str
    indices: list[int]
    confidences: list[float]


@dataclasses.dataclass
class Detection:
    """One accepted species detection."""

    species: Species
    confidence: float
    begin_seconds: float
    end_seconds: float
    model_id: str
    source_id: str = ""
    window_index: int = 0
    timestamp: _dt.datetime | None = None       # wall-clock (realtime mode)
    species_code: str = ""

    @property
    def label(self) -> str:
        return self.species.label

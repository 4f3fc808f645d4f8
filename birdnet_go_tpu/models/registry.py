"""Model registry: the single source of truth for model specs.

Mirrors the reference's registry semantics (internal/classifier/
model_registry.go:137-200, model.go:22-66): per-model sample rate, clip
length, species count, raw-rate trick for the bat model, buffer dimensions
with 50% default overlap, and the realtime budget (inference must finish in
< ClipLength/2 or the pipeline falls behind — model.go:49-54).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static description of a classifier model family."""

    model_id: str
    display_name: str
    sample_rate: int               # rate the model consumes
    clip_seconds: float            # analysis window length at sample_rate
    num_species: int
    default_threshold: float = 0.8
    # Bat "slow-down trick": audio captured at raw_sample_rate is fed to the
    # model unresampled, as if it were sample_rate — ModelSpec.RawSampleRate
    # in the reference (doc/wiki/detection-pipeline.md:103-117).
    raw_sample_rate: int | None = None
    min_capture_rate: int | None = None
    recommended_capture_rate: int | None = None
    embedding_dim: int = 1280

    @property
    def clip_samples(self) -> int:
        return int(round(self.clip_seconds * self.sample_rate))

    @property
    def effective_sample_rate(self) -> int:
        """Rate of the audio actually written into this model's buffers."""
        return self.raw_sample_rate or self.sample_rate

    @property
    def clip_size_bytes(self) -> int:
        """Window size in int16 PCM bytes (ClipSizeBytes in the reference)."""
        return self.clip_samples * 2

    def buffer_dimensions(self) -> tuple[int, int]:
        """(overlap_bytes, read_bytes): 50% overlap default.

        A new window is produced every ClipLength/2 of fresh audio
        (model.go:40-54 BufferDimensions).
        """
        overlap = self.clip_size_bytes // 2
        return overlap, self.clip_size_bytes - overlap

    @property
    def buffer_interval_seconds(self) -> float:
        """Realtime budget per window = ClipLength/2 (model.go:49-54)."""
        return self.clip_seconds / 2.0


BIRDNET_V24 = ModelSpec(
    model_id="BirdNET_V2.4", display_name="BirdNET v2.4",
    sample_rate=48000, clip_seconds=3.0, num_species=6522,
    default_threshold=0.8, embedding_dim=1280,
)
BIRDNET_V3 = ModelSpec(
    model_id="BirdNET_V3.0", display_name="BirdNET v3.0",
    sample_rate=32000, clip_seconds=5.0, num_species=6522,
    default_threshold=0.5, embedding_dim=1280,
)
PERCH_V2 = ModelSpec(
    model_id="Perch_V2", display_name="Google Perch v2",
    sample_rate=32000, clip_seconds=5.0, num_species=14795,
    default_threshold=0.5, embedding_dim=1280,
)
BAT = ModelSpec(
    model_id="BattyBirdNET", display_name="BattyBirdNET bat classifier",
    sample_rate=48000, clip_seconds=3.0, num_species=128,
    default_threshold=0.5, raw_sample_rate=256000,
    min_capture_rate=96000, recommended_capture_rate=192000,
    embedding_dim=1024,
)
BSG = ModelSpec(
    model_id="BSG", display_name="BSG Finland v4.4",
    # regional classifier for Finnish birds (model_registry.go
    # RegistryIDBSG: 48 kHz / 3 s, ONNX); species count follows the
    # installed artifact's label file (the importer probes the head
    # width) — 380 is the nominal label-set size
    sample_rate=48000, clip_seconds=3.0, num_species=380,
    default_threshold=0.5, embedding_dim=1280,
)
GEOMODEL_V24 = ModelSpec(
    model_id="Geomodel_V2.4", display_name="BirdNET range filter v2.4 (MData)",
    sample_rate=0, clip_seconds=0.0, num_species=6522, default_threshold=0.01,
)
GEOMODEL_V3 = ModelSpec(
    model_id="Geomodel_V3.0", display_name="BirdNET Geomodel v3.0",
    sample_rate=0, clip_seconds=0.0, num_species=12012, default_threshold=0.01,
)

MODEL_REGISTRY: dict[str, ModelSpec] = {
    s.model_id: s
    for s in (BIRDNET_V24, BIRDNET_V3, PERCH_V2, BAT, BSG, GEOMODEL_V24,
              GEOMODEL_V3)
}


def get_model_spec(model_id: str) -> ModelSpec:
    try:
        return MODEL_REGISTRY[model_id]
    except KeyError:
        raise KeyError(
            f"unknown model {model_id!r}; known: {sorted(MODEL_REGISTRY)}"
        ) from None

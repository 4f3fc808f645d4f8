"""Model families re-expressed as jitted JAX graphs (param pytrees + apply fns).

The reference runs these as external TFLite/ONNX interpreters
(internal/inference/*); here each family is a native JAX function whose
parameters come either from the weight importers (birdnet_go_tpu.inference)
or from fresh initialization (training / tests).

Families (reference: internal/classifier/model_registry.go:137-200):
- BirdNET v2.4  — 48 kHz / 3 s, 6,522 species, CNN
- BirdNET v3.0  — 32 kHz / 5 s, ONNX in the reference
- Perch v2      — 32 kHz / 5 s, 14,795 species
- Bat (BattyBirdNET) — 48 kHz / 3 s windows of 256 kHz raw audio
  (slow-down trick), two-stage embedding → regional head
- Geomodel range filters — (lat, lon, week) → per-species occurrence
"""

from birdnet_go_tpu.models.registry import (
    ModelSpec,
    MODEL_REGISTRY,
    get_model_spec,
)
from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
from birdnet_go_tpu.models.perch_v2 import PerchV2
from birdnet_go_tpu.models.birdnet_v3 import BirdNETv3
from birdnet_go_tpu.models.bat import BatClassifier
from birdnet_go_tpu.models.geomodel import Geomodel

__all__ = [
    "ModelSpec",
    "MODEL_REGISTRY",
    "get_model_spec",
    "BirdNETv24",
    "PerchV2",
    "BirdNETv3",
    "BatClassifier",
    "Geomodel",
]

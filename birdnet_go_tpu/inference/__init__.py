"""Inference backends: the Classifier protocol, jitted JAX backends, and
weight import (.tflite / .onnx → param pytrees).

Mirrors the reference's backend layer (internal/inference/backend.go:8-84:
Classifier, EmbeddingExtractor, CustomClassifier, RangeFilter,
BatchRangeFilter) with the interpreters replaced by jitted JAX graphs.
"""

from birdnet_go_tpu.inference.backend import (
    Classifier,
    JaxClassifier,
    JaxRangeFilter,
)
from birdnet_go_tpu.inference.checkpoint import save_params, load_params

__all__ = [
    "Classifier",
    "JaxClassifier",
    "JaxRangeFilter",
    "save_params",
    "load_params",
]

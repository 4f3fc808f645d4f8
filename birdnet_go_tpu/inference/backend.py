"""Classifier protocol + jitted JAX backends.

Reference interfaces (internal/inference/backend.go:8-84):
- Classifier: Predict(samples) → logits
- EmbeddingExtractor: Embed(samples) → embedding
- RangeFilter / BatchRangeFilter: occurrence scores for (lat, lon, week)

The JAX backends wrap (model, params) with a jitted, fixed-batch predict —
batch shape is static so XLA compiles exactly one executable per
(model, batch) pair; callers pad (the scheduler guarantees this).
"""

from __future__ import annotations

import functools
from typing import Any, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from birdnet_go_tpu.ops.postprocess import sigmoid_confidence, top_k_results


class Classifier(Protocol):
    """Minimum surface consumed by the pipeline layers."""

    model_id: str
    num_species: int

    def predict_topk(self, pcm: np.ndarray, sensitivity: float = 1.0,
                     k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """float32 PCM [B, clip_samples] → (confidences [B,k], indices [B,k])."""
        ...


class JaxClassifier:
    """Jitted classifier backend over a functional model + params."""

    def __init__(self, model: Any, params: Any, range_mask: np.ndarray | None = None):
        self.model = model
        self.params = jax.device_put(params)
        self.model_id = model.spec.model_id
        self.num_species = model.num_species
        self._range_mask = (jnp.asarray(range_mask, jnp.float32)
                            if range_mask is not None else None)

        @functools.partial(jax.jit, static_argnums=(2,))
        def _predict(params, pcm, k, sensitivity, mask):
            out = self.model.apply(params, pcm)
            conf = sigmoid_confidence(out["logits"], sensitivity)
            if mask is not None:
                conf = conf * mask
            vals, idx = top_k_results(conf, k)
            return vals, idx

        self._jitted = _predict

    def set_range_mask(self, mask: np.ndarray | None) -> None:
        """Swap the included-species mask (range filter rebuild)."""
        self._range_mask = (jnp.asarray(mask, jnp.float32)
                            if mask is not None else None)

    def predict_topk(self, pcm: np.ndarray, sensitivity: float = 1.0,
                     k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        k = min(k, self.num_species)
        vals, idx = self._jitted(self.params, jnp.asarray(pcm, jnp.float32),
                                 k, jnp.float32(sensitivity), self._range_mask)
        return np.asarray(vals), np.asarray(idx)

    def embed(self, pcm: np.ndarray) -> np.ndarray:
        out = jax.jit(self.model.apply)(self.params,
                                        jnp.asarray(pcm, jnp.float32))
        return np.asarray(out["embedding"])


class JaxRangeFilter:
    """Geomodel-backed range filter (reference: onnx/rangefilter.go)."""

    def __init__(self, geomodel: Any, params: Any):
        self.geomodel = geomodel
        self.params = jax.device_put(params)
        self._jitted = jax.jit(geomodel.apply)

    def predict(self, lat: float, lon: float, week: int) -> np.ndarray:
        self._validate(lat, lon)
        coords = jnp.asarray([[lat, lon, float(week)]], jnp.float32)
        return np.asarray(self._jitted(self.params, coords))[0]

    def predict_batch(self, coords: np.ndarray) -> np.ndarray:
        """[N, 3] (lat, lon, week) → [N, S] scores (range heatmap path)."""
        return np.asarray(self._jitted(
            self.params, jnp.asarray(coords, jnp.float32)))

    @staticmethod
    def _validate(lat: float, lon: float) -> None:
        # onnx/rangefilter.go:211-222 coordinate validation
        if not (-90.0 <= lat <= 90.0):
            raise ValueError(f"latitude {lat} outside [-90, 90]")
        if not (-180.0 <= lon <= 180.0):
            raise ValueError(f"longitude {lon} outside [-180, 180]")

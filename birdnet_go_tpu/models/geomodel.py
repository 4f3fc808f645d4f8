"""Geomodel range filters: (lat, lon, week) → per-species occurrence scores.

Reference variants (internal/classifier/birdnet.go:483-657,
internal/inference/onnx/rangefilter.go, internal/inference/tflite/
rangefilter.go:1-109):
- v1/v2 "MData": embedded TFLite FP16 model over the BirdNET v2.4 label set;
- v3.0 "Geomodel": ONNX, 12,012 species, acts as UniversalSpeciesPredictor.

Input contract (onnx/rangefilter.go:204-222): [lat, lon, week] float32 with
lat∈[-90,90], lon∈[-180,180]; week uses the 48-week BirdNET year
(week = (month-1)*4 + min((day-1)/7+1, 4)). week=-1 disables seasonality.

Native JAX: sinusoidal positional encoding of (lat, lon, week) → MLP →
sigmoid occurrence scores. Batched evaluation over a lat/lon grid (the range
heatmap — classifier/heatmap_service.go:17-45) is a trivially jitted vmap.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt

import jax
import jax.numpy as jnp

from birdnet_go_tpu.models import layers as L
from birdnet_go_tpu.models import registry


def birdnet_week(when: _dt.date) -> int:
    """48-week BirdNET year: (month-1)*4 + min((day-1)//7+1, 4)."""
    return (when.month - 1) * 4 + min((when.day - 1) // 7 + 1, 4)


@dataclasses.dataclass(frozen=True)
class GeomodelConfig:
    num_species: int = 6522
    num_frequencies: int = 16     # sinusoidal encoding frequencies per input
    hidden: tuple[int, ...] = (512, 512, 512)


class Geomodel:
    """Occurrence predictor. `apply(params, coords)`; coords [B, 3] f32."""

    spec = registry.GEOMODEL_V24

    def __init__(self, cfg: GeomodelConfig | None = None,
                 compute_dtype=jnp.float32):
        self.cfg = cfg or GeomodelConfig()
        self.compute_dtype = compute_dtype

    @property
    def feature_dim(self) -> int:
        return 3 * 2 * self.cfg.num_frequencies

    def init(self, key: jax.Array):
        dims = [self.feature_dim, *self.cfg.hidden, self.cfg.num_species]
        keys = jax.random.split(key, len(dims) - 1)
        return {"mlp": [L.init_dense(k, dims[i], dims[i + 1])
                        for i, k in enumerate(keys)]}

    def encode(self, coords: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] (lat, lon, week) → sinusoidal features.

        Inputs are normalized to [-1, 1] (lat/90, lon/180, and week mapped
        over the 48-week year; week<0 → 0 features for the seasonal block,
        matching "ignore seasonality" semantics).
        """
        lat = coords[..., 0] / 90.0
        lon = coords[..., 1] / 180.0
        week = coords[..., 2]
        week_n = jnp.where(week >= 0, (week - 1.0) / 47.0 * 2.0 - 1.0, 0.0)
        week_on = (week >= 0).astype(jnp.float32)
        base = jnp.stack([lat, lon, week_n], axis=-1)          # [..., 3]
        freqs = 2.0 ** jnp.arange(self.cfg.num_frequencies, dtype=jnp.float32)
        ang = base[..., None] * freqs * jnp.pi                  # [..., 3, F]
        feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        # Gate the week block when seasonality is disabled.
        gate = jnp.stack([jnp.ones_like(week_on), jnp.ones_like(week_on),
                          week_on], axis=-1)[..., None]
        feats = feats * gate
        return feats.reshape(*coords.shape[:-1], self.feature_dim)

    def apply(self, params, coords: jnp.ndarray) -> jnp.ndarray:
        """[..., 3] → occurrence scores [..., S] in [0, 1]."""
        h = self.encode(coords).astype(self.compute_dtype)
        mlp = params["mlp"]
        for layer in mlp[:-1]:
            h = jax.nn.relu(L.apply_dense(layer, h, self.compute_dtype))
        logits = L.apply_dense(mlp[-1], h, self.compute_dtype)
        return jax.nn.sigmoid(logits.astype(jnp.float32))

    def __call__(self, params, coords):
        return self.apply(params, coords)

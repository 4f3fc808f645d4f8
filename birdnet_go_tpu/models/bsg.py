"""BSG Finland v4.4: regional 48 kHz / 3 s classifier for Finnish birds.

Reference: internal/classifier/model_registry.go RegistryIDBSG ("BSG
Finland", ONNX, 48 kHz / 3 s; catalog model_catalog.go "bsg-finland" —
University of Jyväskylä, non-commercial). The reference runs it as a
plain ONNX session; here the family is a native JAX EfficientNet with a
regional head — production weights import from the catalog's pinned ONNX
artifact (inference.loader / onnx_import), which probes the real head
width off the final Gemm.
"""

from __future__ import annotations

import jax.numpy as jnp

from birdnet_go_tpu.models import registry
from birdnet_go_tpu.models.base import MelCnnModel
from birdnet_go_tpu.models.efficientnet import B0_BLOCKS, EfficientNetConfig
from birdnet_go_tpu.ops.melspec import MelConfig


class BSGFinland(MelCnnModel):
    """`init(key) -> params`, `apply(params, pcm)` — same functional
    contract as the other families; the scheduler batches it like any
    48 kHz / 3 s model."""

    spec = registry.BSG

    def __init__(self, num_species: int | None = None,
                 mel: MelConfig | None = None,
                 compute_dtype=jnp.bfloat16):
        self.num_species = num_species or self.spec.num_species
        self.mel = mel or MelConfig(
            sample_rate=self.spec.sample_rate, n_fft=2048, hop=512,
            n_mels=96, fmin=0.0, fmax=15000.0, mag_scale="nonlinear")
        self.net = EfficientNetConfig(
            blocks=B0_BLOCKS, embedding_dim=self.spec.embedding_dim,
            num_classes=self.num_species)
        self.compute_dtype = compute_dtype

    def init(self, key):
        from birdnet_go_tpu.models.efficientnet import init_efficientnet

        return init_efficientnet(key, self.net)

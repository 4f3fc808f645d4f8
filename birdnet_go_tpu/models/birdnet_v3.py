"""BirdNET v3.0: 32 kHz / 5 s PCM → species logits.

Reference: ONNX instance registered in the orchestrator
(internal/classifier/birdnet_v3.go:1-52, birdnet_v3_onnx.go,
orchestrator_birdnet_v3_onnx.go). Native JAX: mel front end +
EfficientNet-B1-class CNN (v3.0 is a larger refresh of the v2.4 family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from birdnet_go_tpu.models import registry
from birdnet_go_tpu.models.base import MelCnnModel
from birdnet_go_tpu.models.efficientnet import (
    B1_BLOCKS,
    EfficientNetConfig,
    init_efficientnet,
)
from birdnet_go_tpu.ops.melspec import MelConfig


class BirdNETv3(MelCnnModel):
    spec = registry.BIRDNET_V3

    def __init__(self, num_species: int | None = None,
                 mel: MelConfig | None = None,
                 compute_dtype=jnp.bfloat16):
        self.num_species = num_species or self.spec.num_species
        self.mel = mel or MelConfig(
            sample_rate=self.spec.sample_rate, n_fft=2048, hop=640,
            n_mels=128, fmin=0.0, fmax=15000.0, mag_scale="nonlinear")
        self.net = EfficientNetConfig(
            blocks=B1_BLOCKS, embedding_dim=self.spec.embedding_dim,
            num_classes=self.num_species)
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array):
        return init_efficientnet(key, self.net)

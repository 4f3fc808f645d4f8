"""Google Perch v2: 32 kHz / 5 s PCM → 14,795 species logits + embedding.

Reference runs this via ONNX Runtime (internal/classifier/perch.go,
perch_onnx.go, orchestrator_perch_onnx.go); labels are remapped onto the
BirdNET taxonomy for the range filter (mapped_range_filter.go:11). Native
JAX: mel front end + EfficientNet-B1-class CNN.

The 14,795-wide classifier head is the one matmul big enough to shard:
under a device mesh it is tensor-parallel over the species axis
(birdnet_go_tpu.parallel).
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


class PerchV2(MelCnnModel):
    spec = registry.PERCH_V2

    def __init__(self, num_species: int | None = None,
                 mel: MelConfig | None = None,
                 compute_dtype=jnp.bfloat16):
        self.num_species = num_species or self.spec.num_species
        self.mel = mel or MelConfig(
            sample_rate=self.spec.sample_rate, n_fft=2048, hop=640,
            n_mels=160, fmin=60.0, fmax=10000.0, mag_scale="log")
        self.net = EfficientNetConfig(
            blocks=B1_BLOCKS, embedding_dim=self.spec.embedding_dim,
            num_classes=self.num_species)
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array):
        return init_efficientnet(key, self.net)

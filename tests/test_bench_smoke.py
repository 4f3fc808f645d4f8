"""bench.py end-to-end smoke at toy scale.

The driver runs bench.py unattended on the real TPU; a crash there costs a
whole round's headline. This pins the full control flow — AOT compile,
XLA cost analysis (flops/MFU, VERDICT r2 weak #3), the scan-differencing
latency probe, the ModelBatcher e2e diagnostic, and the int8-PTQ
calibrate→quantize→measure leg — on CPU with a tiny model, and checks the
single-JSON-line output contract the driver parses.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import pytest


def test_bench_main_tiny(monkeypatch, capsys):
    import bench
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import (
        BlockSpec,
        EfficientNetConfig,
    )
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny_birdnet():
        m = BirdNETv24(
            num_species=16,
            mel=MelConfig(sample_rate=48000, n_fft=256, hop=9000,
                          n_mels=16),
            compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(
            blocks=(BlockSpec(1, 8, 3, 1, 1), BlockSpec(4, 16, 3, 2, 1)),
            embedding_dim=16, num_classes=16)
        return m

    import birdnet_go_tpu.models.birdnet_v24 as mod

    monkeypatch.setattr(mod, "BirdNETv24", tiny_birdnet)
    monkeypatch.setattr(bench, "BATCH", 2)
    monkeypatch.setattr(bench, "MEASURE_ITERS", 2)
    monkeypatch.setattr(bench, "PROD_BATCH", 2)
    monkeypatch.setattr(bench, "LATENCY_TRIALS", 2)
    monkeypatch.setattr(bench, "LATENCY_BATCHES", 1)

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    # contract: exactly one JSON line on stdout
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "realtime_48khz_streams_per_chip"
    assert rec["value"] > 0 and rec["unit"] == "streams"
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 5.0, rel=0.01)
    assert rec["p50_window_latency_ms"] >= 0
    # new round-3 fields: flops from XLA cost analysis + int8 PTQ leg
    assert rec["flops_per_window_g"] is None or rec["flops_per_window_g"] > 0
    i8 = rec["int8_ptq"]
    assert i8["streams"] > 0 and i8["speedup_vs_bf16"] > 0
    assert "device_kind" in rec

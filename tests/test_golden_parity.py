"""Golden-output regression harness.

The reference's parity precedent is openvino_parity_functional_test.go
(numerical parity between backends). Real model weights are not in this
environment, so the harness records golden outputs of the deterministic
random-init models and fails when ANY numerics change (front end, layers,
importer semantics). When real weights are installed, the same harness
pins their outputs (regenerate with REGEN_GOLDEN=1).
"""

import json
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = Path(__file__).parent / "golden"

REGEN = os.environ.get("REGEN_GOLDEN") == "1"


def _tone_batch():
    t = np.arange(144000) / 48000.0
    rows = [np.sin(2 * np.pi * f * t) * 0.3 for f in (440.0, 2000.0, 7500.0)]
    return np.stack(rows).astype(np.float32)


def _golden_check(name: str, values: np.ndarray, atol=1e-4, rtol=1e-3):
    GOLDEN.mkdir(exist_ok=True)
    path = GOLDEN / f"{name}.json"
    flat = np.asarray(values, np.float64).ravel()
    # fingerprint: shape + strided sample + norm (robust, compact)
    sample_idx = np.linspace(0, flat.size - 1, 64).astype(int)
    fp = {
        "shape": list(np.asarray(values).shape),
        "norm": float(np.linalg.norm(flat)),
        "sample_idx": sample_idx.tolist(),
        "sample": flat[sample_idx].tolist(),
    }
    if REGEN or not path.is_file():
        path.write_text(json.dumps(fp, indent=1))
        if not REGEN:
            pytest.skip(f"golden {name} recorded; re-run to compare")
        return
    want = json.loads(path.read_text())
    assert want["shape"] == fp["shape"], f"{name}: shape changed"
    np.testing.assert_allclose(fp["norm"], want["norm"], rtol=rtol,
                               err_msg=f"{name}: norm drifted")
    np.testing.assert_allclose(
        np.asarray(fp["sample"]), np.asarray(want["sample"]),
        rtol=rtol, atol=atol, err_msg=f"{name}: sampled values drifted")


def test_golden_melspec():
    from birdnet_go_tpu.ops.melspec import MelConfig, melspec

    cfg = MelConfig(sample_rate=48000, n_fft=2048, hop=512, n_mels=96,
                    fmax=15000.0, mag_scale="nonlinear")
    m = np.asarray(jax.jit(lambda x: melspec(x, cfg))(
        jnp.asarray(_tone_batch())))
    _golden_check("melspec_v24", m)


def test_golden_birdnet_v24_logits():
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24

    model = BirdNETv24(compute_dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    logits = np.asarray(jax.jit(model.apply)(
        params, jnp.asarray(_tone_batch()))["logits"])
    _golden_check("birdnet_v24_seed0_logits", logits, rtol=5e-3, atol=5e-3)


def test_golden_geomodel_scores():
    from birdnet_go_tpu.models.geomodel import Geomodel, GeomodelConfig

    g = Geomodel(GeomodelConfig(num_species=512))
    params = g.init(jax.random.PRNGKey(7))
    coords = jnp.asarray([[60.17, 24.94, 23.0], [-33.9, 151.2, 2.0],
                          [0.0, 0.0, -1.0]])
    scores = np.asarray(jax.jit(g.apply)(params, coords))
    _golden_check("geomodel_seed7_scores", scores)


def test_golden_resampler():
    from birdnet_go_tpu.ops.resample import ResampleConfig, polyphase_resample

    rng = np.random.default_rng(5)
    x = rng.standard_normal(48000).astype(np.float32) * 0.3
    y = np.asarray(polyphase_resample(jnp.asarray(x),
                                      ResampleConfig(48000, 32000)))
    _golden_check("resample_48k_32k", y)

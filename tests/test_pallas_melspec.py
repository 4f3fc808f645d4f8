"""Fused Pallas mel kernel: interpret-mode parity vs the XLA path.

(Real-TPU compilation is exercised out-of-band; the kernel is an
experimental opt-in until the Mosaic path is validated on hardware.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from birdnet_go_tpu.ops.melspec import MelConfig, melspec
from birdnet_go_tpu.ops.pallas_melspec import melspec_fused

CFG = MelConfig(sample_rate=48000, n_fft=2048, hop=512, n_mels=96,
                fmax=15000.0, mag_scale="nonlinear")


def test_fused_parity_interpret():
    rng = np.random.default_rng(0)
    pcm16 = (rng.standard_normal((2, 144000)) * 0.05 * 32767).astype(np.int16)
    ref = np.asarray(melspec(jnp.asarray(pcm16, jnp.float32) / 32768.0, CFG))
    got = np.asarray(melspec_fused(jnp.asarray(pcm16), CFG, interpret=True))
    assert got.shape == ref.shape == (2, 278, 96)
    rel = np.abs(ref - got) / (np.abs(ref) + 1e-3)
    assert rel.max() < 1e-3


def test_fused_short_signal_and_log_scale():
    cfg = MelConfig(sample_rate=48000, n_fft=2048, hop=512, n_mels=64,
                    fmax=12000.0, mag_scale="log")
    rng = np.random.default_rng(1)
    pcm16 = (rng.standard_normal((1, 48000)) * 3000).astype(np.int16)
    ref = np.asarray(melspec(jnp.asarray(pcm16, jnp.float32) / 32768.0, cfg))
    got = np.asarray(melspec_fused(jnp.asarray(pcm16), cfg, interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_fused_rejects_unsupported_config():
    with pytest.raises(ValueError):
        melspec_fused(jnp.zeros((1, 48000), jnp.int16),
                      MelConfig(n_fft=1024, hop=512), interpret=True)
    with pytest.raises(ValueError):
        melspec_fused(jnp.zeros((1, 48000), jnp.int16),
                      MelConfig(n_fft=2048, hop=500), interpret=True)


def test_fused_fullband_fmax_parity_interpret():
    """fmax at Nyquist pushes the filterbank to the top DFT bins; the
    packed-twiddle copy must clamp to the real j extent instead of
    crashing (j2 > j_sz), and parity must still hold."""
    cfg = MelConfig(sample_rate=48000, n_fft=2048, hop=512, n_mels=96,
                    fmax=24000.0, mag_scale="nonlinear")
    rng = np.random.default_rng(3)
    pcm16 = (rng.standard_normal((1, 48000)) * 0.1 * 32767).astype(np.int16)
    ref = np.asarray(melspec(jnp.asarray(pcm16, jnp.float32) / 32768.0, cfg))
    got = np.asarray(melspec_fused(jnp.asarray(pcm16), cfg, interpret=True))
    rel = np.abs(ref - got) / (np.abs(ref) + 1e-3)
    assert rel.max() < 1e-3


@pytest.mark.parametrize("groups,unroll,packed",
                         [(8, True, False), (8, False, False),
                          (16, True, False), (16, False, False),
                          (8, True, True), (8, False, True),
                          (16, True, True)])
def test_fused_parity_across_perf_knobs(groups, unroll, packed):
    """The perf knobs (stage-1 group size, static unroll, v4
    conjugate-symmetry packing) must not change numerics — every
    combination matches the XLA path."""
    rng = np.random.default_rng(3)
    pcm16 = (rng.standard_normal((1, 144000)) * 0.05 * 32767).astype(np.int16)
    ref = np.asarray(melspec(jnp.asarray(pcm16, jnp.float32) / 32768.0, CFG))
    got = np.asarray(melspec_fused(jnp.asarray(pcm16), CFG, interpret=True,
                                   groups=groups, unroll=unroll,
                                   packed=packed))
    rel = np.abs(ref - got) / (np.abs(ref) + 1e-3)
    assert rel.max() < 1e-3, (groups, unroll, packed, rel.max())

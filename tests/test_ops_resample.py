import numpy as np
import jax.numpy as jnp

from birdnet_go_tpu.ops.resample import ResampleConfig, polyphase_resample


def _tone(rate, seconds, f_hz):
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * f_hz * t).astype(np.float32)


def test_identity_when_rates_equal():
    cfg = ResampleConfig(48000, 48000)
    x = jnp.asarray(_tone(48000, 0.1, 1000.0))
    y = polyphase_resample(x, cfg)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_downsample_48k_to_32k_preserves_tone():
    cfg = ResampleConfig(48000, 32000)
    x = jnp.asarray(_tone(48000, 0.5, 1000.0))
    y = np.asarray(polyphase_resample(x, cfg))
    assert y.shape[0] == cfg.out_len(x.shape[0]) == 16000
    # dominant frequency via FFT
    spec = np.abs(np.fft.rfft(y[800:-800]))
    freq = np.fft.rfftfreq(y[800:-800].shape[0], 1 / 32000.0)
    assert abs(freq[spec.argmax()] - 1000.0) < 5.0
    # amplitude preserved
    assert abs(np.max(np.abs(y[800:-800])) - 1.0) < 0.05


def test_upsample_32k_to_48k_preserves_tone():
    cfg = ResampleConfig(32000, 48000)
    x = jnp.asarray(_tone(32000, 0.5, 2500.0))
    y = np.asarray(polyphase_resample(x, cfg))
    assert y.shape[0] == 24000
    spec = np.abs(np.fft.rfft(y[800:-800]))
    freq = np.fft.rfftfreq(y[800:-800].shape[0], 1 / 48000.0)
    assert abs(freq[spec.argmax()] - 2500.0) < 5.0


def test_aliasing_rejected_on_downsample():
    # 20 kHz tone is above the 16 kHz Nyquist of 32 kHz output: must vanish.
    cfg = ResampleConfig(48000, 32000)
    x = jnp.asarray(_tone(48000, 0.25, 20000.0))
    y = np.asarray(polyphase_resample(x, cfg))
    assert np.max(np.abs(y[500:-500])) < 0.02


def test_batched_shapes():
    cfg = ResampleConfig(48000, 32000)
    x = jnp.zeros((4, 3, 4800), jnp.float32)
    y = polyphase_resample(x, cfg)
    assert y.shape == (4, 3, 3200)


def test_matches_scipy_resample_poly():
    from scipy.signal import resample_poly

    cfg = ResampleConfig(48000, 32000)
    rng = np.random.default_rng(3)
    # Band-limited noise (energy below 12 kHz, well inside the 16 kHz output
    # Nyquist) so both FIR designs operate in their flat passband; white
    # noise would mostly measure transition-band differences.
    white = rng.standard_normal(9600).astype(np.float32) * 0.5
    spec = np.fft.rfft(white)
    freq = np.fft.rfftfreq(9600, 1 / 48000.0)
    spec[freq > 12000.0] = 0.0
    x = np.fft.irfft(spec, 9600).astype(np.float32)
    y = np.asarray(polyphase_resample(jnp.asarray(x), cfg))
    ref = resample_poly(x, 2, 3)
    n = min(len(y), len(ref))
    err = np.sqrt(np.mean((y[200:n - 200] - ref[200:n - 200]) ** 2))
    sig = np.sqrt(np.mean(ref[200:n - 200] ** 2))
    assert err / sig < 0.01

import numpy as np
import jax.numpy as jnp
import pytest

from birdnet_go_tpu.ops.melspec import (
    MelConfig,
    frame_signal,
    mel_filterbank,
    melspec,
    _rdft_power_matmul,
)


def test_matmul_rdft_matches_numpy_fft():
    rng = np.random.default_rng(0)
    for n_fft in (256, 512, 2048):
        frames = rng.standard_normal((3, n_fft)).astype(np.float32)
        got = np.asarray(_rdft_power_matmul(jnp.asarray(frames), n_fft))
        want = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-2)


def test_frame_signal_shapes_and_content():
    cfg = MelConfig(n_fft=8, hop=4)
    x = jnp.arange(20, dtype=jnp.float32)
    frames = frame_signal(x, cfg)
    assert frames.shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(frames[0]), np.arange(8))
    np.testing.assert_array_equal(np.asarray(frames[1]), np.arange(4, 12))


def test_mel_filterbank_properties():
    cfg = MelConfig()
    fb = np.asarray(mel_filterbank(cfg))
    assert fb.shape == (cfg.n_bins, cfg.n_mels)
    assert (fb >= 0).all()
    # every mel band has some support
    assert (fb.sum(axis=0) > 0).all()


def test_melspec_shape_and_batch():
    cfg = MelConfig(sample_rate=48000, n_fft=512, hop=256, n_mels=32)
    t = 48000
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, t)),
                    dtype=jnp.float32)
    m = melspec(x, cfg)
    assert m.shape == (2, cfg.num_frames(t), 32)
    assert np.isfinite(np.asarray(m)).all()


def test_melspec_pure_tone_lands_in_right_band():
    cfg = MelConfig(sample_rate=48000, n_fft=1024, hop=512, n_mels=64,
                    fmax=15000.0, mag_scale="linear", use_matmul_fft=False)
    t = np.arange(48000) / 48000.0
    for f_hz in (500.0, 2000.0, 8000.0):
        x = jnp.asarray(np.sin(2 * np.pi * f_hz * t), dtype=jnp.float32)
        m = np.asarray(melspec(x, cfg)).mean(axis=0)
        peak_band = int(m.argmax())
        # locate the expected band: mel center frequencies
        from birdnet_go_tpu.ops.melspec import _hz_to_mel, _mel_to_hz
        mel_pts = np.linspace(_hz_to_mel(cfg.fmin), _hz_to_mel(cfg.fmax),
                              cfg.n_mels + 2)
        centers = _mel_to_hz(mel_pts[1:-1])
        expected = int(np.argmin(np.abs(centers - f_hz)))
        assert abs(peak_band - expected) <= 1, (f_hz, peak_band, expected)


def test_melspec_matmul_fft_consistent_with_rfft_path():
    cfg_mm = MelConfig(sample_rate=48000, n_fft=512, hop=256, n_mels=48,
                       use_matmul_fft=True, mag_scale="log")
    cfg_ref = MelConfig(sample_rate=48000, n_fft=512, hop=256, n_mels=48,
                        use_matmul_fft=False, mag_scale="log")
    x = jnp.asarray(np.random.default_rng(2).standard_normal(24000),
                    dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(melspec(x, cfg_mm)),
                               np.asarray(melspec(x, cfg_ref)),
                               rtol=1e-3, atol=1e-3)


def test_too_short_signal_raises():
    cfg = MelConfig(n_fft=512, hop=256)
    with pytest.raises(ValueError):
        frame_signal(jnp.zeros(100), cfg)

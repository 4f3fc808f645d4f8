import numpy as np
import jax.numpy as jnp

from birdnet_go_tpu.ops.pcm import pcm16_to_float32, float32_to_pcm16
from birdnet_go_tpu.ops.postprocess import (
    apply_range_mask,
    occurrence_mask,
    sigmoid_confidence,
    top_k_results,
)
from birdnet_go_tpu.ops.windows import (
    num_windows,
    slice_overlapped_windows,
    window_hop_samples,
)


def test_pcm_roundtrip():
    pcm = jnp.asarray(np.array([-32768, -1, 0, 1, 32767], np.int16))
    f = pcm16_to_float32(pcm)
    assert float(f[0]) == -1.0
    assert abs(float(f[-1]) - 32767 / 32768) < 1e-7
    back = float32_to_pcm16(f)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pcm))


def test_sigmoid_sensitivity():
    logits = jnp.asarray([0.0, 2.0, -2.0])
    c1 = np.asarray(sigmoid_confidence(logits, 1.0))
    c15 = np.asarray(sigmoid_confidence(logits, 1.5))
    assert abs(c1[0] - 0.5) < 1e-6
    assert c15[1] > c1[1]          # higher sensitivity sharpens
    assert c15[2] < c1[2]


def test_top_k():
    conf = jnp.asarray([[0.1, 0.9, 0.5, 0.7]])
    vals, idx = top_k_results(conf, 3)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 2])
    np.testing.assert_allclose(np.asarray(vals[0]), [0.9, 0.7, 0.5])


def test_range_mask():
    conf = jnp.asarray([0.9, 0.8, 0.7])
    mask = occurrence_mask(jnp.asarray([0.5, 0.001, 0.2]), threshold=0.01)
    out = np.asarray(apply_range_mask(conf, mask))
    np.testing.assert_allclose(out, [0.9, 0.0, 0.7])


def test_window_hop_scaling():
    # 3s base, overlap 1.5 s → hop = 1.5 s at 48 kHz
    assert window_hop_samples(144000, 1.5, 48000) == 72000
    # 5 s clip at 32 kHz: overlap scales by 5/3
    hop = window_hop_samples(160000, 1.5, 32000, clip_seconds=5.0)
    assert hop == 160000 - int(round(1.5 * (5 / 3) * 32000))
    # zero overlap → hop = clip
    assert window_hop_samples(144000, 0.0, 48000) == 144000


def test_slice_overlapped_windows_matches_naive():
    x = jnp.arange(25, dtype=jnp.float32)
    w = slice_overlapped_windows(x, clip_samples=10, hop_samples=5)
    assert w.shape == (num_windows(25, 10, 5), 10)
    np.testing.assert_array_equal(np.asarray(w[0]), np.arange(10))
    np.testing.assert_array_equal(np.asarray(w[1]), np.arange(5, 15))
    # last window zero-padded
    last = np.asarray(w[-1])
    assert last[-1] == 0.0 or last[-1] == 24.0


def test_slice_short_signal_pads():
    x = jnp.ones(5, jnp.float32)
    w = slice_overlapped_windows(x, clip_samples=10, hop_samples=5)
    assert w.shape == (1, 10)
    np.testing.assert_array_equal(np.asarray(w[0]), [1] * 5 + [0] * 5)

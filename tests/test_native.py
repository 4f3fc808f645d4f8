"""Native C++ data plane: build, exact parity with the Python ring buffer,
batch drain, memory policy. Skips cleanly if no toolchain."""

import numpy as np
import pytest

from birdnet_go_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_version_and_arena():
    assert native.set_malloc_arena_max(2)


def test_native_ring_matches_python_semantics():
    from birdnet_go_tpu.audio.buffers import AnalysisBuffer

    py = AnalysisBuffer(overlap_samples=4, read_samples=4)
    nt = native.NativeAnalysisBuffer(overlap_samples=4, read_samples=4)
    rng = np.random.default_rng(0)
    for chunk_len in (3, 5, 1, 8, 2, 13, 4, 4, 7):
        chunk = rng.integers(-1000, 1000, chunk_len).astype(np.int16)
        py.write(chunk)
        nt.write(chunk)
        while True:
            a = py.read()
            b = nt.read()
            if a is None or b is None:
                assert a is None and b is None
                break
            np.testing.assert_array_equal(a, b)


def test_native_ring_overwrite_accounting():
    nt = native.NativeAnalysisBuffer(overlap_samples=2, read_samples=2,
                                     capacity_samples=8)
    nt.write(np.arange(20, dtype=np.int16))
    assert nt.total_overwritten > 0
    w = nt.read()
    assert w is not None and len(w) == 4


def test_native_ring_fuzz_vs_python():
    from birdnet_go_tpu.audio.buffers import AnalysisBuffer

    rng = np.random.default_rng(7)
    py = AnalysisBuffer(overlap_samples=7, read_samples=13,
                        capacity_samples=64)
    nt = native.NativeAnalysisBuffer(overlap_samples=7, read_samples=13,
                                     capacity_samples=64)
    for _ in range(300):
        n = int(rng.integers(1, 40))
        chunk = rng.integers(-32768, 32767, n).astype(np.int16)
        py.write(chunk)
        nt.write(chunk)
        if rng.random() < 0.7:
            a, b = py.read(), nt.read()
            if a is None:
                assert b is None
            else:
                np.testing.assert_array_equal(a, b)
    assert py.total_overwritten == nt.total_overwritten


def test_native_batch_drain():
    nt = native.NativeAnalysisBuffer(overlap_samples=2, read_samples=2,
                                     capacity_samples=64)
    nt.write(np.arange(1, 11, dtype=np.int16))   # 10 samples → 5 windows
    batch = nt.read_batch(8)
    assert batch.shape == (5, 4)
    np.testing.assert_array_equal(batch[0], [0, 0, 1, 2])
    np.testing.assert_array_equal(batch[1], [1, 2, 3, 4])
    assert nt.read() is None


def test_alsa_gracefully_absent_or_present():
    # either ALSA loads (then opening a bogus device fails cleanly) or the
    # shim reports unavailable; both are valid outcomes on this host
    if native.alsa_available():
        with pytest.raises(RuntimeError):
            native.AlsaCapture(device="nonexistent:99")
    else:
        with pytest.raises(RuntimeError):
            native.AlsaCapture()

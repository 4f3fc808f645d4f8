"""Spectrogram PNG rendering from the shared device STFT kernel.

Reference: internal/spectrogram — generates detection-clip PNGs via SoX
(FFT-friendly heights, generator.go:111-123) with FFmpeg showspectrumpic
fallback, frequency profiles (bird 24 kHz resample → 0-12 kHz axis; bat
fixed 256 kHz → 0-128 kHz axis, frequency_profile.go:1-30), a PreRenderer
background worker queue (prerenderer.go:45-590), and
semaphore+singleflight concurrency.

Here the SoX/FFmpeg subprocesses are replaced by the SAME spectrum op the
model front end uses (ops.melspec._spectrum) — the north-star shared-kernel
requirement (SURVEY.md §2.8 item 6) — rendered to PNG host-side with PIL.
"""

from __future__ import annotations

import dataclasses
import logging
import queue
import threading
from pathlib import Path

import numpy as np

from birdnet_go_tpu.ops.melspec import MelConfig, frame_signal, _spectrum
from birdnet_go_tpu.ops.resample import ResampleConfig, polyphase_resample

log = logging.getLogger("birdnet_tpu.spectrogram")

# Reference size presets (ARCHITECTURE.md:2480-2485)
SIZES = {"sm": 400, "md": 800, "lg": 1000, "xl": 1200}


@dataclasses.dataclass(frozen=True)
class FrequencyProfile:
    """Bird: resample to 24 kHz (0-12 kHz axis). Bat: raw 256 kHz fixed
    0-128 kHz axis (frequency_profile.go:13-16)."""

    name: str
    target_rate: int | None          # resample before STFT (None = keep)
    fmax_hz: float

    @classmethod
    def bird(cls):
        return cls(name="bird", target_rate=24000, fmax_hz=12000.0)

    @classmethod
    def bat(cls):
        return cls(name="bat", target_rate=None, fmax_hz=128000.0)


# Inferno-like 8-stop colormap (dark → bright), interpolated to 256 RGB.
_STOPS = np.array([
    (0, 0, 4), (40, 11, 84), (101, 21, 110), (159, 42, 99),
    (212, 72, 66), (245, 125, 21), (250, 193, 39), (252, 255, 164)],
    np.float32)


def _colormap() -> np.ndarray:
    xs = np.linspace(0, len(_STOPS) - 1, 256)
    lo = np.floor(xs).astype(int)
    hi = np.minimum(lo + 1, len(_STOPS) - 1)
    t = (xs - lo)[:, None]
    return ((1 - t) * _STOPS[lo] + t * _STOPS[hi]).astype(np.uint8)


_CMAP = _colormap()


def render_spectrogram(samples: np.ndarray, sample_rate: int,
                       width: int = 800, height: int = 0,
                       profile: FrequencyProfile | None = None,
                       dyn_range_db: float = 80.0) -> "Image":
    """float32 PCM → PIL Image (linear-frequency, SoX-style).

    Heights are FFT-friendly: n_fft = 2·(height−1) when height is given,
    otherwise height = n_fft//2 + 1 with n_fft=512 (generator.go:111-123
    picks FFT-friendly heights the same way).
    """
    from PIL import Image

    profile = profile or FrequencyProfile.bird()
    rate = sample_rate
    if profile.target_rate and sample_rate != profile.target_rate:
        import jax.numpy as jnp

        cfg = ResampleConfig(sample_rate, profile.target_rate)
        samples = np.asarray(polyphase_resample(
            jnp.asarray(samples, jnp.float32), cfg))
        rate = profile.target_rate

    if height and height > 16:
        n_fft = 2 * (height - 1)
        n_fft = 1 << int(np.ceil(np.log2(n_fft)))  # radix-friendly
        height = n_fft // 2 + 1
    else:
        n_fft = 512
        height = n_fft // 2 + 1

    hop = max(1, (len(samples) - n_fft) // max(width - 1, 1))
    cfg = MelConfig(sample_rate=rate, n_fft=n_fft, hop=hop,
                    window="hann", use_matmul_fft=False, mag_scale="linear")
    if len(samples) < n_fft:
        samples = np.pad(samples, (0, n_fft - len(samples)))
    import jax.numpy as jnp

    frames = frame_signal(jnp.asarray(samples, jnp.float32), cfg)
    power = np.asarray(_spectrum(frames, cfg))     # [F, bins]

    db = 10.0 * np.log10(power.T + 1e-12)          # [bins, F]
    top = db.max() if np.isfinite(db.max()) else 0.0
    db = np.clip(db, top - dyn_range_db, top)
    norm = (db - (top - dyn_range_db)) / dyn_range_db
    img_idx = (norm * 255).astype(np.uint8)[::-1, :]   # low freq at bottom
    rgb = _CMAP[img_idx]
    img = Image.fromarray(rgb, "RGB")
    if img.size != (width, height):
        img = img.resize((width, height), Image.BILINEAR)
    return img


def generate_png(samples: np.ndarray, sample_rate: int, out_path: str | Path,
                 width: int = 800, profile: FrequencyProfile | None = None
                 ) -> Path:
    """Render + atomic write (temp file + rename, as the reference does)."""
    out = Path(out_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    img = render_spectrogram(samples, sample_rate, width=width,
                             profile=profile)
    tmp = out.with_suffix(out.suffix + ".tmp")
    img.save(tmp, format="PNG")
    tmp.rename(out)
    return out


class PreRenderer:
    """Background spectrogram worker pool with singleflight dedup.

    Reference: spectrogram/prerenderer.go — renders from in-memory PCM
    right after a detection is saved so the UI never waits; duplicate
    requests for the same output coalesce.
    """

    def __init__(self, workers: int = 2):
        self._queue: queue.Queue = queue.Queue(maxsize=256)
        self._inflight: set[str] = set()
        self._lock = threading.Lock()
        self._threads: list[threading.Thread] = []
        self._workers = workers
        self.rendered = 0
        self.dropped = 0

    def queue_depth(self) -> int:
        """Pending render jobs (the /spectrogram/:id/status probe)."""
        return self._queue.qsize()

    def start(self) -> None:
        if self._threads:
            return
        for i in range(self._workers):
            t = threading.Thread(target=self._run, name=f"prerender-{i}",
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        for _ in self._threads:
            self._queue.put(None)
        for t in self._threads:
            t.join(timeout=5)
        self._threads.clear()

    def submit(self, samples: np.ndarray, sample_rate: int,
               out_path: str | Path, width: int = 800,
               profile: FrequencyProfile | None = None) -> bool:
        key = str(out_path)
        with self._lock:
            if key in self._inflight:         # singleflight
                return True
            self._inflight.add(key)
        try:
            self._queue.put_nowait((samples, sample_rate, out_path, width,
                                    profile))
        except queue.Full:
            with self._lock:
                self._inflight.discard(key)
            self.dropped += 1
            return False
        return True

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                return
            samples, rate, out_path, width, profile = item
            try:
                generate_png(samples, rate, out_path, width, profile)
                self.rendered += 1
            except Exception:
                log.exception("prerender failed for %s", out_path)
            finally:
                with self._lock:
                    self._inflight.discard(str(out_path))

"""Octave-band sound-level publication worker.

Reference: internal/analysis/sound_level*.go — periodic 1/3-octave-band
levels per source published to SSE, MQTT, and metrics.
"""

from __future__ import annotations

import logging
import threading
import time

import numpy as np

log = logging.getLogger("birdnet_tpu.soundlevel")


class SoundLevelWorker:
    def __init__(self, engine, sse=None, mqtt=None, mqtt_topic: str = "birdnet",
                 interval_seconds: float = 10.0):
        self.engine = engine
        self.sse = sse
        self.mqtt = mqtt
        self.mqtt_topic = mqtt_topic
        self.interval = interval_seconds
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._jitted = {}
        self.published = 0

    def sample_once(self) -> dict:
        """One measurement pass over every source."""
        import jax
        import jax.numpy as jnp

        from birdnet_go_tpu.ops.soundlevel import (
            SoundLevelConfig,
            band_levels_db,
        )

        out = {}
        now = time.time()
        for src in self.engine.sources():
            cb = self.engine.capture_buffer(src.source_id)
            if cb is None:
                continue
            pcm = cb.read_segment(now - self.interval, now)
            if not len(pcm):
                continue
            rate = cb.sample_rate
            cfg = SoundLevelConfig(sample_rate=rate)
            key = (rate, len(pcm))
            fn = self._jitted.get(key)
            if fn is None:
                fn = jax.jit(lambda x: band_levels_db(x, cfg)[0])
                self._jitted[key] = fn
            x = jnp.asarray(pcm.astype(np.float32) / 32768.0)
            levels = np.asarray(fn(x))
            from birdnet_go_tpu.ops.soundlevel import third_octave_centers

            centers = third_octave_centers(cfg.fmin,
                                           min(cfg.fmax, rate / 2))
            out[src.source_id] = {
                "bands_hz": [round(float(c), 1) for c in centers],
                "levels_db": [round(float(v), 1) for v in levels],
                "time": now,
            }
        return out

    def publish_once(self) -> None:
        data = self.sample_once()
        if not data:
            return
        if self.sse is not None:
            self.sse.publish("soundlevels", "soundlevel", data)
        if self.mqtt is not None:
            self.mqtt.publish(f"{self.mqtt_topic}/soundlevels", data)
        self.published += 1

    def start(self) -> None:
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, name="soundlevel",
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                self.publish_once()
            except Exception:
                log.exception("sound level pass failed")

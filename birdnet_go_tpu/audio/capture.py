"""Soundcard capture source (native ALSA shim → engine.ingest).

Reference: internal/audiocore/capture.go (malgo/miniaudio CGO callback).
Here a reader thread pulls 100 ms chunks from the native ALSA capture
(birdnet_go_tpu.native) and pushes them into the engine like any other
source; absence of ALSA degrades with a clear error at start.
"""

from __future__ import annotations

import logging
import threading

from birdnet_go_tpu.audio.source import AudioSource, SourceType

log = logging.getLogger("birdnet_tpu.capture")


class SoundcardSource:
    def __init__(self, engine, device: str = "default",
                 source_id: str | None = None, rate: int = 48000,
                 channels: int = 1, chunk_seconds: float = 0.1):
        self.engine = engine
        self.device = device
        self.rate = rate
        self.channels = channels
        self.chunk_frames = max(1, int(rate * chunk_seconds))
        self.source = AudioSource(
            source_id=source_id or f"card:{device}",
            source_type=SourceType.AUDIO_CARD,
            display_name=f"soundcard {device}", uri=device,
            sample_rate=rate, channels=channels)
        self._capture = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        from birdnet_go_tpu import native

        if not native.alsa_available():
            raise RuntimeError(
                "ALSA capture unavailable (no libasound on this host)")
        self._capture = native.AlsaCapture(
            device=self.device, rate=self.rate, channels=self.channels)
        self.engine.add_source(self.source)
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name=f"capture-{self.source.source_id}",
            daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None
        if self._capture is not None:
            self._capture.close()
            self._capture = None
        self.engine.remove_source(self.source.source_id)

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                pcm = self._capture.read(self.chunk_frames)
            except RuntimeError as e:
                log.error("capture failed on %s: %s", self.device, e)
                return
            if pcm is not None and len(pcm):
                self.engine.ingest(self.source.source_id, pcm)

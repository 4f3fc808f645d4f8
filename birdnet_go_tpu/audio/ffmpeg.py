"""FFmpeg subprocess stream source (RTSP/HTTP ingest).

Reference: internal/audiocore/ffmpeg — per-stream FFmpeg subprocess
writing raw s16le mono PCM at the target rate to stdout (common.go:117-136,
stream.go:859-942), stdout framing with partial-sample carry
(stream.go:1159 readStdout), watchdogs (silence timeout, quick-exit) and
restart with exponential backoff (stream.go:1241-1534).

FFmpeg is an external binary in the reference too; absence degrades to a
clear error at source start.
"""

from __future__ import annotations

import logging
import shutil
import subprocess
import threading
import time

import numpy as np

from birdnet_go_tpu.audio.source import AudioSource, SourceType, safe_string

log = logging.getLogger("birdnet_tpu.ffmpeg")

_CHUNK_SAMPLES = 4800                 # 100 ms at 48 kHz
_QUICK_EXIT_SECONDS = 5.0             # exited faster than this = failing
_SILENCE_TIMEOUT = 60.0
_MAX_BACKOFF = 60.0


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def build_ffmpeg_args(url: str, sample_rate: int = 48000,
                      transport: str = "tcp") -> list[str]:
    """Raw-PCM-to-stdout command (audio-only media mode)."""
    args = ["ffmpeg", "-hide_banner", "-loglevel", "error", "-nostdin"]
    if url.startswith("rtsp://"):
        args += ["-rtsp_transport", transport]
    args += [
        "-i", url,
        "-vn",                        # audio-only
        "-f", "s16le", "-acodec", "pcm_s16le",
        "-ac", "1", "-ar", str(sample_rate),
        "pipe:1",
    ]
    return args


class FfmpegSource:
    """Self-healing FFmpeg stream: reader thread + restart with backoff."""

    def __init__(self, engine, url: str, source_id: str | None = None,
                 sample_rate: int = 48000, transport: str = "tcp"):
        self.engine = engine
        self.url = url
        self.sample_rate = sample_rate
        self.transport = transport
        self.source = AudioSource(
            source_id=source_id or safe_string(url),
            source_type=(SourceType.RTSP if url.startswith("rtsp")
                         else SourceType.HTTP),
            display_name=safe_string(url), uri=url, sample_rate=sample_rate)
        self._proc: subprocess.Popen | None = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.restarts = 0
        self.bytes_received = 0
        self.last_data = 0.0

    def start(self) -> None:
        if not ffmpeg_available():
            raise RuntimeError(
                "ffmpeg binary not found; RTSP/HTTP sources unavailable")
        self.engine.add_source(self.source)
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._supervise, name=f"ffmpeg-{self.source.source_id}",
            daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        self._kill()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
        self.engine.remove_source(self.source.source_id)

    def _kill(self) -> None:
        p = self._proc
        if p is not None and p.poll() is None:
            p.terminate()
            try:
                p.wait(timeout=3)
            except subprocess.TimeoutExpired:
                p.kill()

    # -- supervision (restart w/ backoff — stream.go:1241-1534) ---------------------

    def _supervise(self) -> None:
        backoff = 1.0
        while not self._stop.is_set():
            started = time.monotonic()
            try:
                self._run_once()
            except Exception as e:
                log.warning("stream %s failed: %s", self.source.source_id, e)
            if self._stop.is_set():
                return
            ran = time.monotonic() - started
            if ran < _QUICK_EXIT_SECONDS:
                backoff = min(backoff * 2, _MAX_BACKOFF)
            else:
                backoff = 1.0
            self.restarts += 1
            log.info("restarting stream %s in %.0fs (restart #%d)",
                     self.source.source_id, backoff, self.restarts)
            self._stop.wait(backoff)

    def _run_once(self) -> None:
        args = build_ffmpeg_args(self.url, self.sample_rate, self.transport)
        self._proc = subprocess.Popen(
            args, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            bufsize=0)
        carry = b""                       # partial-sample carry
        chunk_bytes = _CHUNK_SAMPLES * 2
        self.last_data = time.monotonic()
        while not self._stop.is_set():
            data = self._proc.stdout.read(chunk_bytes)
            if not data:
                rc = self._proc.poll()
                raise RuntimeError(f"ffmpeg exited rc={rc}")
            self.last_data = time.monotonic()
            self.bytes_received += len(data)
            buf = carry + data
            usable = len(buf) - (len(buf) % 2)
            carry = buf[usable:]
            pcm = np.frombuffer(buf[:usable], dtype="<i2")
            if len(pcm):
                self.engine.ingest(self.source.source_id, pcm)
        self._kill()

"""ctypes loader + wrappers for libbirdnet_host.so."""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger("birdnet_tpu.native")

_REPO_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _REPO_ROOT / "build" / "libbirdnet_host.so"
_SRC_DIR = _REPO_ROOT / "native"

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def build_native() -> bool:
    """Compile native/birdnet_host.cpp with make/g++; returns success."""
    try:
        res = subprocess.run(["make", "-C", str(_SRC_DIR),
                              f"BUILD_DIR={_REPO_ROOT / 'build'}"],
                             capture_output=True, text=True, timeout=120)
        if res.returncode != 0:
            log.warning("native build failed: %s", res.stderr[-500:])
            return False
        return _LIB_PATH.is_file()
    except (OSError, subprocess.TimeoutExpired) as e:
        log.warning("native build unavailable: %s", e)
        return False


def _load():
    global _lib, _build_attempted
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.is_file() and not _build_attempted:
            _build_attempted = True
            build_native()
        if not _LIB_PATH.is_file():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.bn_ring_create.restype = ctypes.c_void_p
        lib.bn_ring_create.argtypes = [ctypes.c_int64] * 3
        lib.bn_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.bn_ring_write.argtypes = [ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int16),
                                      ctypes.c_int64]
        lib.bn_ring_read.restype = ctypes.c_int64
        lib.bn_ring_read.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int16)]
        lib.bn_ring_read_batch.restype = ctypes.c_int64
        lib.bn_ring_read_batch.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int16),
                                           ctypes.c_int64]
        lib.bn_ring_available.restype = ctypes.c_int64
        lib.bn_ring_available.argtypes = [ctypes.c_void_p]
        lib.bn_ring_lost.restype = ctypes.c_int64
        lib.bn_ring_lost.argtypes = [ctypes.c_void_p]
        lib.bn_set_malloc_arena_max.restype = ctypes.c_int
        lib.bn_set_malloc_arena_max.argtypes = [ctypes.c_int]
        lib.bn_alsa_available.restype = ctypes.c_int
        lib.bn_alsa_open.restype = ctypes.c_void_p
        lib.bn_alsa_open.argtypes = [ctypes.c_char_p, ctypes.c_uint,
                                     ctypes.c_uint, ctypes.c_uint]
        lib.bn_alsa_read.restype = ctypes.c_long
        lib.bn_alsa_read.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_int16),
                                     ctypes.c_ulong]
        lib.bn_alsa_close.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "bn_alsa_list_devices"):
            lib.bn_alsa_list_devices.restype = ctypes.c_long
            lib.bn_alsa_list_devices.argtypes = [ctypes.c_char_p,
                                                 ctypes.c_long]
        # native lossy codecs (codecs.cpp: dlopen libopus / libmp3lame)
        if hasattr(lib, "bn_opus_available"):
            lib.bn_opus_available.restype = ctypes.c_int
            lib.bn_opus_encode.restype = ctypes.c_int64
            lib.bn_opus_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.bn_opus_decode.restype = ctypes.c_int64
            lib.bn_opus_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
            lib.bn_opus_stream_create.restype = ctypes.c_void_p
            lib.bn_opus_stream_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            lib.bn_opus_stream_encode.restype = ctypes.c_int64
            lib.bn_opus_stream_encode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32)]
            lib.bn_opus_stream_destroy.argtypes = [ctypes.c_void_p]
            lib.bn_mp3_available.restype = ctypes.c_int
            lib.bn_mp3_encode.restype = ctypes.c_int64
            lib.bn_mp3_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int64]
        # AAC-LC via dlopen'd libavcodec (codecs.cpp bn_aac_*)
        if hasattr(lib, "bn_aac_available"):
            lib.bn_aac_available.restype = ctypes.c_int
            lib.bn_aac_stream_create.restype = ctypes.c_void_p
            lib.bn_aac_stream_create.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32)]
            lib.bn_aac_stream_encode.restype = ctypes.c_int64
            lib.bn_aac_stream_encode.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32)]
            lib.bn_aac_stream_flush.restype = ctypes.c_int64
            lib.bn_aac_stream_flush.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32)]
            lib.bn_aac_stream_destroy.argtypes = [ctypes.c_void_p]
            lib.bn_aac_stream_delay.restype = ctypes.c_int32
            lib.bn_aac_stream_delay.argtypes = [ctypes.c_void_p]
            lib.bn_aac_decode.restype = ctypes.c_int64
            lib.bn_aac_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int32, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
            # persistent decoder (RTP/RFC 3640 streams)
            lib.bn_aac_decoder_create.restype = ctypes.c_void_p
            lib.bn_aac_decoder_create.argtypes = [
                ctypes.c_char_p, ctypes.c_int32, ctypes.c_int, ctypes.c_int]
            lib.bn_aac_decoder_decode.restype = ctypes.c_int64
            lib.bn_aac_decoder_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
            lib.bn_aac_decoder_destroy.argtypes = [ctypes.c_void_p]
        # stream farm (stream_farm.cpp: native high-stream-count ingest)
        if hasattr(lib, "bn_farm_create"):
            lib.bn_farm_create.restype = ctypes.c_void_p
            lib.bn_farm_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
                ctypes.c_uint64, ctypes.c_double, ctypes.c_int64]
            lib.bn_farm_set_waveform.restype = ctypes.c_int
            lib.bn_farm_set_waveform.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64]
            lib.bn_farm_start.restype = ctypes.c_int
            lib.bn_farm_start.argtypes = [ctypes.c_void_p]
            lib.bn_farm_stop.argtypes = [ctypes.c_void_p]
            lib.bn_farm_destroy.argtypes = [ctypes.c_void_p]
            lib.bn_farm_collect.restype = ctypes.c_int64
            lib.bn_farm_collect.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.bn_farm_stats.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_int64)]
            if hasattr(lib, "bn_farm_grow"):
                lib.bn_farm_grow.restype = ctypes.c_int64
                lib.bn_farm_grow.argtypes = [ctypes.c_void_p,
                                             ctypes.c_double]
        if hasattr(lib, "bn_rtspd_create"):
            lib.bn_rtspd_create.restype = ctypes.c_void_p
            lib.bn_rtspd_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double]
            lib.bn_rtspd_add.restype = ctypes.c_int
            lib.bn_rtspd_add.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int64, ctypes.c_char_p]
            lib.bn_rtspd_start.restype = ctypes.c_int
            lib.bn_rtspd_start.argtypes = [ctypes.c_void_p]
            lib.bn_rtspd_stop.argtypes = [ctypes.c_void_p]
            lib.bn_rtspd_destroy.argtypes = [ctypes.c_void_p]
            lib.bn_rtspd_collect.restype = ctypes.c_int64
            lib.bn_rtspd_collect.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int16),
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64]
            lib.bn_rtspd_stats.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int64)]
            lib.bn_rtsps_create.restype = ctypes.c_void_p
            lib.bn_rtsps_create.argtypes = [
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_uint64, ctypes.c_int64]
            lib.bn_rtsps_port.restype = ctypes.c_int64
            lib.bn_rtsps_port.argtypes = [ctypes.c_void_p]
            lib.bn_rtsps_start.restype = ctypes.c_int
            lib.bn_rtsps_start.argtypes = [ctypes.c_void_p]
            lib.bn_rtsps_stop.argtypes = [ctypes.c_void_p]
            lib.bn_rtsps_destroy.argtypes = [ctypes.c_void_p]
            lib.bn_rtsps_stats.argtypes = [ctypes.c_void_p,
                                           ctypes.POINTER(ctypes.c_int64)]
        lib.bn_version.restype = ctypes.c_char_p
        _lib = lib
        log.info("native host library loaded: %s",
                 lib.bn_version().decode())
        return _lib


def available() -> bool:
    return _load() is not None


def alsa_available() -> bool:
    lib = _load()
    return bool(lib and lib.bn_alsa_available())


def alsa_list_devices() -> list[dict]:
    """Capture-capable PCM devices via snd_device_name_hint
    (DeviceManager enumeration role, device.go:95). [] without ALSA."""
    lib = _load()
    if lib is None or not hasattr(lib, "bn_alsa_list_devices") \
            or not lib.bn_alsa_available():
        return []
    buf = ctypes.create_string_buffer(65536)
    n = lib.bn_alsa_list_devices(buf, len(buf))
    if n <= 0:
        return []
    out = []
    for line in buf.raw[:n].decode(errors="replace").splitlines():
        name, _, desc = line.partition("\t")
        if name:
            out.append({"name": name,
                        "description": desc.replace("\n", " — ")})
    return out


def set_malloc_arena_max(arenas: int = 2) -> bool:
    """Low-memory policy (reference: mempolicy glibc arena cap)."""
    lib = _load()
    if lib is None:
        return False
    return lib.bn_set_malloc_arena_max(arenas) == 1


def _i16_ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))


class NativeAnalysisBuffer:
    """Drop-in for audio.buffers.AnalysisBuffer backed by C++."""

    def __init__(self, overlap_samples: int, read_samples: int,
                 capacity_samples: int | None = None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.overlap = overlap_samples
        self.read_size = read_samples
        self.window_size = overlap_samples + read_samples
        self._h = lib.bn_ring_create(overlap_samples, read_samples,
                                     capacity_samples or 0)
        if not self._h:
            raise RuntimeError("bn_ring_create failed")

    def write(self, samples: np.ndarray, now: float | None = None) -> None:
        samples = np.ascontiguousarray(samples, np.int16)
        self._lib.bn_ring_write(self._h, _i16_ptr(samples), len(samples))

    def read(self) -> np.ndarray | None:
        out = np.empty(self.window_size, np.int16)
        n = self._lib.bn_ring_read(self._h, _i16_ptr(out))
        return out if n else None

    def read_batch(self, max_windows: int) -> np.ndarray:
        """Drain up to max_windows windows → [n, window_size] int16."""
        out = np.empty((max_windows, self.window_size), np.int16)
        n = self._lib.bn_ring_read_batch(self._h, _i16_ptr(out), max_windows)
        return out[:n]

    def available(self) -> int:
        return int(self._lib.bn_ring_available(self._h))

    @property
    def total_overwritten(self) -> int:
        return int(self._lib.bn_ring_lost(self._h))

    def overwrite_rate(self, window_seconds: float = 300.0,
                       now: float | None = None) -> float:
        # coarse: lifetime ratio (the Python impl keeps a sliding window)
        avail = self.available()
        lost = self.total_overwritten
        total = max(avail + lost, 1)
        return lost / total

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.bn_ring_destroy(self._h)
        except Exception:
            pass


class StreamFarm:
    """Native high-stream-count ingest plane (stream_farm.cpp): per-stream
    synthesis + rings + window packing run in C++ with no GIL; Python does
    ONE collect() FFI call per scheduler tick and hands the packed block
    straight to ModelBatcher.offer_block. This is the ≥2,000-stream soak's
    ingest (VERDICT r2 #1: ring writes + packing off the Python plane)."""

    def __init__(self, n_streams: int, sample_rate: int = 48000,
                 window_samples: int = 144000, hop_samples: int = 72000,
                 ring_seconds: float = 12.0, n_waveforms: int = 16,
                 seed: int = 1, timescale: float = 1.0,
                 stagger_hops: int = 1):
        lib = _load()
        if lib is None or not hasattr(lib, "bn_farm_create"):
            raise RuntimeError("native stream farm unavailable")
        self._lib = lib
        self.n_streams = n_streams
        self.sample_rate = sample_rate
        self.window_samples = window_samples
        self.hop_samples = hop_samples
        self._h = lib.bn_farm_create(n_streams, sample_rate, window_samples,
                                     hop_samples, ring_seconds, n_waveforms,
                                     seed, timescale, stagger_hops)
        if not self._h:
            raise RuntimeError("bn_farm_create failed")

    def set_waveform(self, idx: int, pcm: np.ndarray) -> bool:
        pcm = np.ascontiguousarray(pcm, np.int16)
        return bool(self._lib.bn_farm_set_waveform(
            self._h, idx, _i16_ptr(pcm), len(pcm)))

    def start(self) -> None:
        if not self._lib.bn_farm_start(self._h):
            raise RuntimeError("bn_farm_start failed")

    def stop(self) -> None:
        if self._h:
            self._lib.bn_farm_stop(self._h)

    def collect(self, out: np.ndarray, meta: np.ndarray) -> int:
        """Drain ready windows into caller-owned out[n, window] int16 and
        meta[n, 3] int64 (stream_id, window_index, ready_ns-since-start);
        returns count."""
        return int(self._lib.bn_farm_collect(
            self._h, _i16_ptr(out),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(out)))

    def stats(self) -> dict:
        buf = (ctypes.c_int64 * 8)()
        self._lib.bn_farm_stats(self._h, buf)
        return {"samples_generated": buf[0], "windows_emitted": buf[1],
                "samples_lost": buf[2], "ready_windows": buf[3],
                "n_streams": buf[4], "ring_capacity": buf[5],
                # max unread samples ever observed on any stream — the
                # slack a host stall actually consumed; adaptive ring
                # sizing keys on this (VERDICT r3 #7)
                "backlog_high_water": buf[6],
                # current generator lag behind realtime (max over
                # streams): the capture-side stall signal — lets slack
                # grow MID-stall, before the catch-up flood arrives
                "generator_deficit": buf[7]}

    def grow(self, new_ring_seconds: float) -> int:
        """Grow every stream's ring to new_ring_seconds of slack in
        place, preserving unread audio (stop-the-world; one memcpy
        pass). Returns the new capacity in samples (0 on failure;
        unchanged capacity when not larger)."""
        if not hasattr(self._lib, "bn_farm_grow"):
            return 0
        return int(self._lib.bn_farm_grow(
            self._h, ctypes.c_double(new_ring_seconds)))

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.bn_farm_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RtspDemux:
    """Consolidated native RTSP ingest (rtsp_plane.cpp): ONE epoll thread
    owns every session's handshake, RTP demux, payload decode, and
    analysis-ring write — the 2,000-stream answer to the reference's
    FFmpeg-subprocess-per-stream model (stream.go:471-1534, SURVEY §7
    "consolidated demux strategy"). collect() is a StreamFarm.collect
    drop-in, so the DeviceLoop fill path is shared with the soak farm."""

    def __init__(self, n_streams: int, sample_rate: int = 48000,
                 window_samples: int = 144000, hop_samples: int = 72000,
                 ring_seconds: float = 12.0):
        lib = _load()
        if lib is None or not hasattr(lib, "bn_rtspd_create"):
            raise RuntimeError("native rtsp demux unavailable")
        self._lib = lib
        self.n_streams = n_streams
        self.sample_rate = sample_rate
        self.window_samples = window_samples
        self.hop_samples = hop_samples
        self._h = lib.bn_rtspd_create(n_streams, sample_rate,
                                      window_samples, hop_samples,
                                      ring_seconds)
        if not self._h:
            raise RuntimeError("bn_rtspd_create failed")

    def add(self, idx: int, host: str, port: int, path: str = "/") -> None:
        if not self._lib.bn_rtspd_add(self._h, idx, host.encode(), port,
                                      path.encode()):
            raise ValueError(f"bn_rtspd_add({idx}) failed")

    def start(self) -> None:
        if not self._lib.bn_rtspd_start(self._h):
            raise RuntimeError("bn_rtspd_start failed")

    def stop(self) -> None:
        if self._h:
            self._lib.bn_rtspd_stop(self._h)

    def collect(self, out: np.ndarray, meta: np.ndarray) -> int:
        """Drain ready windows into out[n, window] int16 + meta[n, 3]
        int64 (stream_id, window_index, ready_ns-since-demux-start)."""
        return int(self._lib.bn_rtspd_collect(
            self._h, _i16_ptr(out),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(out)))

    def stats(self) -> dict:
        buf = (ctypes.c_int64 * 12)()
        self._lib.bn_rtspd_stats(self._h, buf)
        return {"samples_received": buf[0], "windows_emitted": buf[1],
                "samples_lost": buf[2], "ready_windows": buf[3],
                "connected": buf[4], "restarts": buf[5],
                "bytes_received": buf[6], "packets": buf[7],
                "backlog_high_water": buf[8],
                # the demux thread's own CLOCK_THREAD_CPUTIME_ID — divide
                # by streams x wall time for measured ingest CPU/stream
                "demux_cpu_ns": buf[9],
                "n_streams": buf[10], "ring_capacity": buf[11]}

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.bn_rtspd_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RtspLoadServer:
    """Single-threaded epoll RTSP/L16 load server (test rig) — paces N
    realtime sessions from a pre-byteswapped waveform bank so the demux
    can be proven at 500+ streams over real TCP on one core. Drops whole
    packets with accounting when a client stalls (bounded-queue
    contract)."""

    def __init__(self, port: int = 0, rate: int = 48000,
                 n_waveforms: int = 8, seed: int = 1, pkt_ms: int = 50):
        lib = _load()
        if lib is None or not hasattr(lib, "bn_rtsps_create"):
            raise RuntimeError("native rtsp load server unavailable")
        self._lib = lib
        self._h = lib.bn_rtsps_create(port, rate, n_waveforms, seed,
                                      pkt_ms)
        if not self._h:
            raise RuntimeError("bn_rtsps_create failed (port in use?)")
        self.port = int(lib.bn_rtsps_port(self._h))

    def start(self) -> None:
        if not self._lib.bn_rtsps_start(self._h):
            raise RuntimeError("bn_rtsps_start failed")

    def stop(self) -> None:
        if self._h:
            self._lib.bn_rtsps_stop(self._h)

    def stats(self) -> dict:
        buf = (ctypes.c_int64 * 6)()
        self._lib.bn_rtsps_stats(self._h, buf)
        return {"accepted": buf[0], "playing": buf[1],
                "samples_sent": buf[2], "samples_dropped": buf[3],
                "server_cpu_ns": buf[4], "port": buf[5]}

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.bn_rtsps_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class AlsaCapture:
    """Soundcard capture via the native ALSA shim (device enumeration and
    format conversion happen ALSA-side through snd_pcm_set_params)."""

    def __init__(self, device: str = "default", rate: int = 48000,
                 channels: int = 1, latency_us: int = 100000):
        lib = _load()
        if lib is None or not lib.bn_alsa_available():
            raise RuntimeError("ALSA unavailable")
        self._lib = lib
        self.rate = rate
        self.channels = channels
        self._pcm = lib.bn_alsa_open(device.encode(), rate, channels,
                                     latency_us)
        if not self._pcm:
            raise RuntimeError(f"cannot open ALSA device {device!r}")

    def read(self, frames: int) -> np.ndarray | None:
        buf = np.empty(frames * self.channels, np.int16)
        n = self._lib.bn_alsa_read(self._pcm, _i16_ptr(buf), frames)
        if n < 0:
            raise RuntimeError("ALSA read failed")
        if n == 0:
            return None
        out = buf[:int(n) * self.channels]
        if self.channels > 1:
            out = out.reshape(-1, self.channels).mean(axis=1).astype(np.int16)
        return out

    def close(self) -> None:
        if self._pcm:
            self._lib.bn_alsa_close(self._pcm)
            self._pcm = None

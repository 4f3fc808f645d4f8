"""Clip encoding front end: native WAV/FLAC, FFmpeg-gated AAC/Opus/MP3.

Reference: internal/conf/native_encoders.go + audiocore/aac/opus — the
reference's DEFAULT path for lossy formats is an FFmpeg subprocess, with
native encoders behind a feature gate. Mirrored here: WAV and FLAC (with
real fixed-predictor compression) are native; aac/opus/mp3 shell out to
ffmpeg when the binary exists and otherwise fall back to native FLAC so a
clip is never lost to a missing encoder.
"""

from __future__ import annotations

import logging
import shutil
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger("birdnet_tpu.encode")

_FFMPEG_FORMATS = {
    "aac": ([".m4a"], ["-c:a", "aac", "-b:a", "96k", "-movflags",
                       "+faststart"]),
    "opus": ([".opus", ".ogg"], ["-c:a", "libopus", "-b:a", "64k"]),
    "mp3": ([".mp3"], ["-c:a", "libmp3lame", "-b:a", "128k"]),
}

# injectable for tests; resolved lazily so PATH changes apply
_which = shutil.which
_run = subprocess.run


def ffmpeg_available() -> bool:
    return _which("ffmpeg") is not None


def supported_formats() -> list[str]:
    out = ["wav", "flac"]
    if ffmpeg_available():
        out += list(_FFMPEG_FORMATS)
    return out


def resolve_format(fmt: str) -> tuple[str, str]:
    """(actual format, file suffix) the encoder will REALLY produce for a
    configured export format — callers must name clips with this suffix
    BEFORE recording them in the database, or rows point at files that
    don't exist (aac writes .m4a; lossy without ffmpeg falls back to
    flac)."""
    fmt = (fmt or "wav").lower()
    if fmt in ("", "wav"):
        return "wav", ".wav"
    if fmt == "flac":
        return "flac", ".flac"
    if fmt in _FFMPEG_FORMATS:
        if ffmpeg_available():
            return fmt, _FFMPEG_FORMATS[fmt][0][0]
        return "flac", ".flac"
    raise ValueError(f"unsupported clip format {fmt!r}")


def load_clip_audio(path: str | Path) -> tuple[np.ndarray, int]:
    """Decode a stored clip → (float32 samples [-1,1], sample_rate).
    Understands the formats this codebase writes natively (WAV, FLAC);
    used by spectrogram (re)generation."""
    path = Path(path)
    if path.suffix.lower() == ".flac":
        from birdnet_go_tpu.audio.flac import decode_flac

        pcm, rate = decode_flac(path.read_bytes())
        return pcm.astype(np.float32) / 32768.0, rate
    from birdnet_go_tpu.audio.wav import read_wav

    samples, info = read_wav(path)
    return samples, info.sample_rate


# suffix → format (a .m4a file is AAC, .ogg is opus, …)
_SUFFIX_FMT = {"m4a": "aac", "aac": "aac", "opus": "opus", "ogg": "opus",
               "mp3": "mp3", "wav": "wav", "flac": "flac"}


def encode_clip(pcm_i16: np.ndarray, sample_rate: int, out_path: str | Path,
                fmt: str | None = None) -> Path:
    """Write PCM to out_path in `fmt` (default: by file suffix). Returns the
    actual path written — it may differ when a lossy format falls back to
    FLAC because FFmpeg is absent."""
    out = Path(out_path)
    fmt = (fmt or out.suffix.lstrip(".")).lower()
    fmt = _SUFFIX_FMT.get(fmt, fmt)
    if fmt in ("", "wav"):
        from birdnet_go_tpu.audio.wav import write_wav

        tmp = out.with_suffix(out.suffix + ".tmp")
        with open(tmp, "wb") as f:
            write_wav(f, pcm_i16, sample_rate)
        tmp.rename(out)
        return out
    if fmt == "flac":
        from birdnet_go_tpu.audio.flac import write_flac

        return write_flac(out, pcm_i16, sample_rate)
    if fmt in _FFMPEG_FORMATS:
        if ffmpeg_available():
            return _ffmpeg_encode(pcm_i16, sample_rate, out, fmt)
        fallback = out.with_suffix(".flac")
        log.warning("ffmpeg not found: %s export falls back to FLAC (%s)",
                    fmt, fallback.name)
        from birdnet_go_tpu.audio.flac import write_flac

        return write_flac(fallback, pcm_i16, sample_rate)
    raise ValueError(f"unsupported clip format {fmt!r}")


def _ffmpeg_encode(pcm_i16: np.ndarray, sample_rate: int, out: Path,
                   fmt: str) -> Path:
    """Raw s16le on stdin → encoded file via atomic temp+rename (the
    reference's FFmpeg export contract: export.go)."""
    suffixes, codec_args = _FFMPEG_FORMATS[fmt]
    if out.suffix.lower() not in suffixes:
        out = out.with_suffix(suffixes[0])
    tmp = out.with_name(out.name + ".tmp" + out.suffix)
    cmd = ["ffmpeg", "-hide_banner", "-loglevel", "error", "-y",
           "-f", "s16le", "-ar", str(sample_rate), "-ac", "1", "-i", "-",
           *codec_args, str(tmp)]
    proc = _run(cmd, input=np.asarray(pcm_i16, "<i2").tobytes(),
                capture_output=True, timeout=120)
    if proc.returncode != 0:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(
            f"ffmpeg {fmt} encode failed: {proc.stderr.decode()[:300]}")
    tmp.rename(out)
    return out

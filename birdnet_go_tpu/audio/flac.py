"""Native FLAC encoder (lossless, verbatim + constant subframes).

Reference: internal/audiocore/flac (go-flac) — native clip export without
FFmpeg. This implements a spec-compliant FLAC stream: fLaC marker,
STREAMINFO metadata block (with MD5 of the unencoded samples), and frames
of VERBATIM subframes (CONSTANT where a block is flat), with the required
UTF-8-style frame numbering and CRC-8/CRC-16 checks. Output is bit-exact
losslessly decodable by any FLAC decoder; compression is not attempted
(clips are short; the win is container correctness without subprocesses).
"""

from __future__ import annotations

import hashlib
import struct
from pathlib import Path

import numpy as np

_BLOCK = 4096                       # samples per frame


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


def _utf8_like(n: int) -> bytes:
    """FLAC frame-number coding (UTF-8-style, up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > (7 - n_bytes) + 6 * (n_bytes - 1) and n_bytes < 7:
        n_bytes += 1
    payload = n
    tail = []
    for _ in range(n_bytes - 1):
        tail.append(0x80 | (payload & 0x3F))
        payload >>= 6
    lead_prefix = (0xFF << (8 - n_bytes)) & 0xFF
    out.append(lead_prefix | payload)
    out.extend(reversed(tail))
    return bytes(out)


_RATE_CODE = {88200: 0x1, 176400: 0x2, 192000: 0x3, 8000: 0x4, 16000: 0x5,
              22050: 0x6, 24000: 0x7, 32000: 0x8, 44100: 0x9, 48000: 0xA,
              96000: 0xB}


def encode_flac(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 samples → FLAC stream bytes."""
    samples = np.asarray(samples, np.int16)
    n = len(samples)
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    # STREAMINFO: min/max blocksize, min/max framesize(0), rate(20b),
    # channels-1(3b), bps-1(5b), total samples(36b), md5(16B)
    min_bs = min(_BLOCK, n) if n else _BLOCK
    info = struct.pack(">HH", min_bs, _BLOCK)
    info += b"\x00\x00\x00" * 2                      # unknown frame sizes
    # rate(20) | channels-1(3) | bps-1(5) | total samples(36) = 64 bits
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | n
    info += packed.to_bytes(8, "big")
    info += md5
    header = b"fLaC" + bytes([0x80, 0, 0, len(info)]) + info

    out = bytearray(header)
    rate_code = _RATE_CODE.get(sample_rate)
    for fi, start in enumerate(range(0, n, _BLOCK)):
        block = samples[start:start + _BLOCK]
        bs = len(block)
        # frame header: sync(14)=0x3FFE, reserved, blocking=fixed(0)
        hdr = bytearray(b"\xff\xf8")
        if bs == _BLOCK:
            bs_code, bs_extra = 0xC, b""                 # 4096
        else:
            bs_code, bs_extra = 0x7, struct.pack(">H", bs - 1)  # 16-bit end
        if rate_code is not None:
            sr_code, sr_extra = rate_code, b""
        elif sample_rate < 65536:
            sr_code, sr_extra = 0xD, struct.pack(">H", sample_rate)  # Hz
        else:
            sr_code, sr_extra = 0xE, struct.pack(">H", sample_rate // 10)
        hdr.append((bs_code << 4) | sr_code)
        # channels=mono(0), sample size=16 (code 0b100), reserved 0
        hdr.append((0x0 << 4) | (0b100 << 1))
        hdr += _utf8_like(fi)
        hdr += bs_extra + sr_extra
        hdr.append(_crc8(bytes(hdr)))
        # subframe: VERBATIM (type 000001) or CONSTANT (000000)
        body = bytearray(hdr)
        if bs and np.all(block == block[0]):
            body.append(0b000000 << 1)                   # CONSTANT
            body += struct.pack(">h", int(block[0]))
        else:
            body.append(0b000001 << 1)                   # VERBATIM
            body += block.astype(">i2").tobytes()
        body += struct.pack(">H", _crc16(bytes(body)))
        out += body
    return bytes(out)


def write_flac(path: str | Path, samples: np.ndarray,
               sample_rate: int) -> Path:
    path = Path(path)
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(encode_flac(samples, sample_rate))
    tmp.rename(path)
    return path

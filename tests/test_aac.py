"""Native AAC-LC: encoder round trip, ADTS framing, M4A muxing, and
AAC fMP4 HLS (audio/aacenc.py, native/codecs.cpp bn_aac_*; reference
internal/audiocore/aac/encode.go + hlsmux/codec_aac.go). The decode
oracle is libavcodec's own AAC decoder — segments that don't decode
fail here, not in a user's browser."""

import struct
import time

import numpy as np
import pytest

from birdnet_go_tpu.audio import aacenc

pytestmark = pytest.mark.skipif(not aacenc.available(),
                                reason="libavcodec AAC unavailable")

RATE = 48000


def _tone(seconds=2.0, freq=1200.0, rate=RATE):
    t = np.arange(int(rate * seconds)) / rate
    return (0.4 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)


def _aligned_corr(decoded, original, search=4096):
    """Correlation after compensating the codec priming delay."""
    d = decoded.astype(np.float64)
    o = original.astype(np.float64)
    n = min(len(o), len(d) - search)
    best = max(range(0, search, 32),
               key=lambda k: float(np.dot(d[k:k + n], o[:n])))
    return float(np.corrcoef(d[best:best + n], o[:n])[0, 1])


def test_encode_decode_round_trip():
    pcm = _tone()
    packets, asc = aacenc.encode_aac(pcm, RATE)
    assert len(asc) >= 2
    # ASC: AOT=2 (LC), freq index 3 (48 kHz), 1 channel
    assert asc[0] >> 3 == 2
    assert (asc[0] & 0x7) << 1 | (asc[1] >> 7) == 3
    assert (asc[1] >> 3) & 0xF == 1
    # ~1024 samples per packet
    assert len(packets) == pytest.approx(len(pcm) / 1024, abs=4)
    decoded = aacenc.decode_aac(packets, asc, RATE)
    assert _aligned_corr(decoded, pcm) > 0.99


def test_streaming_chunks_join_seamlessly():
    """Feeding in odd-sized chunks must produce the same audio as one
    shot (partial-frame carry across calls)."""
    pcm = _tone(3.0)
    enc = aacenc.AacStreamEncoder(RATE)
    packets = []
    for off in range(0, len(pcm), 7001):
        packets += enc.feed(pcm[off:off + 7001])
    packets += enc.flush()
    enc.close()
    one_shot, asc = aacenc.encode_aac(pcm, RATE)
    a = aacenc.decode_aac(packets, enc.asc, RATE)
    b = aacenc.decode_aac(one_shot, asc, RATE)
    n = min(len(a), len(b))
    assert float(np.corrcoef(a[:n], b[:n])[0, 1]) > 0.999


def test_adts_frames():
    pcm = _tone(1.0)
    packets, _ = aacenc.encode_aac(pcm, RATE)
    stream = aacenc.adts_bytes(packets, RATE)
    assert stream[0] == 0xFF and stream[1] == 0xF1
    assert aacenc.parse_adts(stream) == packets


def test_m4a_write_read_decode(tmp_path):
    pcm = _tone(2.0)
    packets, asc, priming = aacenc.encode_aac_with_priming(pcm, RATE)
    assert priming >= 1024          # FFmpeg AAC encoder delay
    path = aacenc.write_m4a(tmp_path / "clip.m4a", packets, asc, RATE,
                            priming=priming)
    p2, asc2, rate2, priming2 = aacenc.read_m4a(path)
    assert p2 == packets and asc2 == asc and rate2 == RATE
    assert priming2 == priming      # edit list round-trips the delay
    decoded = aacenc.decode_aac(p2, asc2, rate2)
    assert _aligned_corr(decoded, pcm) > 0.99
    # trimming the declared priming aligns the head with the source
    trimmed = decoded[priming2:priming2 + RATE].astype(np.float64)
    ref = pcm[:RATE].astype(np.float64)
    assert float(np.corrcoef(trimmed, ref)[0, 1]) > 0.95


def test_encode_clip_aac_and_load(tmp_path):
    from birdnet_go_tpu.audio.encode import (
        encode_clip,
        load_clip_audio,
        resolve_format,
    )

    assert resolve_format("aac", RATE) == ("aac", ".m4a")
    # bat capture rate has no AAC sampling index → lossless fallback
    assert resolve_format("aac", 256000) == ("flac", ".flac")
    pcm = _tone(1.0)
    out = encode_clip(pcm, RATE, tmp_path / "c.m4a", fmt="aac")
    assert out.suffix == ".m4a"
    samples, rate = load_clip_audio(out)
    assert rate == RATE
    assert _aligned_corr((samples * 32768).astype(np.int16), pcm) > 0.99


def test_hls_aac_segments_decode_continuously():
    """AAC fMP4 HLS: init carries mp4a+esds; consecutive segments'
    packets decode as ONE continuous stream (persistent encoder — no
    per-segment reset), and trun durations are all 1024."""
    from birdnet_go_tpu.audio.buffers import CaptureBuffer
    from birdnet_go_tpu.audio.hlsmux import HlsSession

    cb = CaptureBuffer(RATE, capacity_seconds=30)
    t0 = time.time() - 25
    pcm = _tone(25.0, freq=880.0)
    cb.write(pcm, timestamp=t0)
    s = HlsSession("s1", cb, segment_seconds=2.0)
    assert s.codec == "aac"
    assert b"mp4a" in s.init and b"esds" in s.init and b"fLaC" not in s.init
    for i in range(4):
        assert s.tick(t0 + 4 + i * 2)

    all_packets = []
    for seq in (1, 2, 3, 4):
        seg = s.segment(seq)
        # trun: count then per-sample (duration, size) pairs
        trun_pos = seg.find(b"trun")
        n = struct.unpack(">I", seg[trun_pos + 8:trun_pos + 12])[0]
        entries = [struct.unpack(
            ">II", seg[trun_pos + 16 + 8 * j:trun_pos + 24 + 8 * j])
            for j in range(n)]
        assert all(d == aacenc.AAC_FRAME_SAMPLES for d, _ in entries)
        mdat_pos = seg.find(b"mdat")
        payload = seg[mdat_pos + 4:]
        off = 0
        for _, size in entries:
            all_packets.append(payload[off:off + size])
            off += size
        assert off == len(payload)
    decoded = aacenc.decode_aac(all_packets, s._aac.asc, RATE)
    # one continuous 880 Hz tone across all segment joins
    assert _aligned_corr(decoded, pcm[:len(decoded)]) > 0.98

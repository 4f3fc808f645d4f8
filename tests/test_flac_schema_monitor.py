"""FLAC encoder (independent spec-level decode), config schema, sysmonitor,
health-in-/health, species dictionary, time-of-day."""

import hashlib
import json
import struct
import urllib.request

import numpy as np
import pytest

from birdnet_go_tpu.audio.flac import _crc8, _crc16, encode_flac
from birdnet_go_tpu.config.schema import generate_schema
from birdnet_go_tpu.utils.sysmonitor import resources
from tests.test_app_integration import tiny_app  # fixture


# -- FLAC: spec-level independent decode ---------------------------------------------

def _decode_flac_verbatim(blob: bytes) -> tuple[np.ndarray, int, bytes]:
    """Minimal independent FLAC reader for mono/16-bit verbatim+constant
    streams: follows the spec's bit layout, NOT the encoder's code paths."""
    assert blob[:4] == b"fLaC"
    assert blob[4] & 0x80                           # last metadata block
    assert blob[4] & 0x7F == 0                      # STREAMINFO
    (length,) = struct.unpack(">I", b"\x00" + blob[5:8])
    info = blob[8:8 + length]
    packed = int.from_bytes(info[10:18], "big")
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    md5 = info[18:34]
    assert channels == 1 and bps == 16

    pos = 8 + length
    samples = []
    frame_idx = 0
    while pos < len(blob):
        # frame header
        start = pos
        sync = struct.unpack(">H", blob[pos:pos + 2])[0]
        assert sync >> 2 == 0x3FFE, f"bad sync at {pos}"
        bs_code = blob[pos + 2] >> 4
        sr_code = blob[pos + 2] & 0xF
        pos += 4
        # frame number (UTF-8-like, here always < 0x80 for short clips? no —
        # handle multi-byte)
        first = blob[pos]
        if first < 0x80:
            pos += 1
        else:
            extra = 0
            v = first
            while v & 0x40:
                extra += 1
                v <<= 1
            pos += 1 + extra
        if bs_code == 0xC:
            bs = 4096
        elif bs_code == 0x7:
            bs = struct.unpack(">H", blob[pos:pos + 2])[0] + 1
            pos += 2
        else:
            raise AssertionError(f"unexpected blocksize code {bs_code}")
        if sr_code == 0xD:
            pos += 2
        elif sr_code == 0xE:
            pos += 2
        crc8 = blob[pos]
        assert crc8 == _crc8(blob[start:pos])
        pos += 1
        # subframe
        sub_hdr = blob[pos]
        pos += 1
        sub_type = (sub_hdr >> 1) & 0x3F
        if sub_type == 0:                            # CONSTANT
            (val,) = struct.unpack(">h", blob[pos:pos + 2])
            pos += 2
            samples.extend([val] * bs)
        elif sub_type == 1:                          # VERBATIM
            frame = np.frombuffer(blob[pos:pos + bs * 2], dtype=">i2")
            pos += bs * 2
            samples.extend(frame.tolist())
        else:
            raise AssertionError(f"unexpected subframe type {sub_type}")
        crc16 = struct.unpack(">H", blob[pos:pos + 2])[0]
        assert crc16 == _crc16(blob[start:pos])
        pos += 2
        frame_idx += 1
    arr = np.asarray(samples[:total], np.int16)
    return arr, rate, md5


def test_flac_roundtrip_lossless():
    # White noise is incompressible: the encoder falls back to VERBATIM,
    # which this INDEPENDENT spec-level reader understands.
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(10000) * 20000).astype(np.int16)
    blob = encode_flac(pcm, 48000)
    decoded, rate, md5 = _decode_flac_verbatim(blob)
    assert rate == 48000
    np.testing.assert_array_equal(decoded, pcm)
    assert md5 == hashlib.md5(pcm.astype("<i2").tobytes()).digest()


def test_flac_fixed_prediction_compresses_and_roundtrips():
    """Tonal audio must come out smaller than raw (FIXED+Rice subframes)
    and reconstruct bit-exactly via the full decoder (MD5-verified)."""
    from birdnet_go_tpu.audio.flac import decode_flac

    rng = np.random.default_rng(1)
    t = np.arange(48000 * 3) / 48000.0
    pcm = (3000 * np.sin(2 * np.pi * 1500 * t)
           + 150 * rng.standard_normal(len(t))).astype(np.int16)
    blob = encode_flac(pcm, 48000)
    assert len(blob) < 0.8 * len(pcm) * 2          # real compression
    decoded, rate = decode_flac(blob)
    assert rate == 48000
    np.testing.assert_array_equal(decoded, pcm)
    # edge lengths round-trip too
    for n in (1, 5, 4095, 4097):
        x = (rng.standard_normal(n) * 500).astype(np.int16)
        np.testing.assert_array_equal(decode_flac(encode_flac(x, 24000))[0],
                                      x)


def test_flac_constant_blocks_and_odd_rates():
    pcm = np.full(5000, 123, np.int16)               # constant → CONSTANT
    blob = encode_flac(pcm, 22050)
    decoded, rate, _ = _decode_flac_verbatim(blob)
    assert rate == 22050
    np.testing.assert_array_equal(decoded, pcm)
    # blob much smaller than verbatim would be
    assert len(blob) < 5000

    # 256 kHz bat rate (needs the Hz/10 escape)
    blob = encode_flac(np.zeros(100, np.int16), 256000)
    decoded, rate, _ = _decode_flac_verbatim(blob)
    assert rate == 256000


def test_save_audio_action_flac(tmp_path):
    import time

    from birdnet_go_tpu.analysis.actions import SaveAudioAction
    from birdnet_go_tpu.audio.buffers import CaptureBuffer

    from birdnet_go_tpu.audio.flac import decode_flac

    cb = CaptureBuffer(sample_rate=8000, capacity_seconds=5.0)
    now = time.time() - 3
    cb.write((np.arange(16000) % 256 - 128).astype(np.int16), timestamp=now)
    action = SaveAudioAction(capture_buffer=cb, start_time=now,
                             end_time=now + 2,
                             out_path=tmp_path / "clip.flac",
                             sample_rate=8000)
    action.execute()
    blob = (tmp_path / "clip.flac").read_bytes()
    decoded, rate = decode_flac(blob)
    assert rate == 8000 and len(decoded) == 16000


# -- config schema ----------------------------------------------------------------------

def test_schema_structure():
    s = generate_schema()
    assert s["type"] == "object"
    props = s["properties"]
    assert "models" in props and props["models"]["type"] == "array"
    model_props = props["models"]["items"]["properties"]
    assert model_props["threshold"] == {"type": "number", "default": 0.8}
    assert props["location"]["properties"]["latitude"]["anyOf"][1] == \
        {"type": "null"}
    assert props["webserver"]["properties"]["port"]["default"] == 8080
    # schema must be valid JSON
    json.dumps(s)


# -- sysmonitor ----------------------------------------------------------------------------

def test_resources_sampling(tmp_path):
    r = resources(str(tmp_path))
    assert r["cpu"]["cores"] >= 1
    assert r["memory"]["total_bytes"] > 0
    assert 0 <= r["disk"]["used_percent"] <= 100


# -- API wiring -------------------------------------------------------------------------------

def test_health_checks_and_new_endpoints(tiny_app):
    app = tiny_app
    app.settings.location.latitude = 52.5
    app.settings.location.longitude = 13.4
    app.start(warmup=False)
    port = app.settings.webserver.port

    def get(p):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/v2{p}", timeout=10) as r:
            return json.loads(r.read())

    h = get("/health")
    assert h["status"] in ("healthy", "degraded")
    names = {c["name"] for c in h["checks"]}
    assert {"database", "jobqueue", "streams", "inference",
            "range_filter"} <= names

    res = get("/system/resources")
    assert res["memory"]["total_bytes"] > 0

    schema = get("/settings/schema")
    assert schema["title"] == "birdnet-tpu configuration"

    d = get("/species/dictionary/en_us")
    assert isinstance(d, dict) and len(d) >= 6

    # time-of-day for a seeded noon detection
    import datetime

    from tests.test_realtime_core import _detection

    noon = datetime.datetime(2026, 6, 1, 12, 0,
                             tzinfo=datetime.timezone.utc).timestamp()
    det_id = app.datastore.insert_detection(_detection(ts=noon))
    tod = get(f"/detections/{det_id}/time-of-day")
    assert tod["phase"] == "day"
    app.stop()

"""RTSP end-to-end: a genuine in-process RTSP/RTP server (the MediaMTX
testcontainer analogue — SURVEY.md §4) streams audio to the native RTSP
client, through the engine, into windows."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from birdnet_go_tpu.audio.engine import AudioEngine
from birdnet_go_tpu.audio.rtsp import (
    ALAW,
    MULAW,
    RtspSource,
    decode_payload,
    parse_sdp_audio,
)
from birdnet_go_tpu.models.registry import ModelSpec


class MiniRtspServer(threading.Thread):
    """RFC 2326 subset: OPTIONS/DESCRIBE/SETUP/PLAY/TEARDOWN with
    TCP-interleaved RTP streaming of a provided PCM signal."""

    def __init__(self, pcm: np.ndarray, rate: int = 8000,
                 codec: str = "L16", packet_ms: float = 20.0,
                 realtime: bool = False):
        super().__init__(daemon=True)
        self.pcm = pcm.astype(np.int16)
        self.rate = rate
        self.codec = codec
        self.samples_per_packet = int(rate * packet_ms / 1000)
        self.realtime = realtime
        self.aac_packets: list[bytes] = []
        self.asc = b""
        if codec == "MPEG4-GENERIC":
            from birdnet_go_tpu.audio import aacenc

            self.aac_packets, self.asc = aacenc.encode_aac(self.pcm, rate)
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(2)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self.teardown_seen = False

    @property
    def url(self) -> str:
        return f"rtsp://127.0.0.1:{self.port}/stream1"

    def _sdp(self) -> str:
        pt = {"L16": 97, "PCMU": 0, "PCMA": 8,
              "MPEG4-GENERIC": 96}[self.codec]
        rtpmap = f"a=rtpmap:{pt} {self.codec}/{self.rate}/1\r\n" \
            if pt >= 96 else ""
        fmtp = ""
        if self.codec == "MPEG4-GENERIC":
            fmtp = (f"a=fmtp:{pt} profile-level-id=1;mode=AAC-hbr;"
                    f"config={self.asc.hex()};sizeLength=13;"
                    "indexLength=3;indexDeltaLength=3\r\n")
        return ("v=0\r\no=- 0 0 IN IP4 127.0.0.1\r\ns=mini\r\n"
                "t=0 0\r\n"
                f"m=audio 0 RTP/AVP {pt}\r\n"
                + rtpmap + fmtp + "a=control:track1\r\n")

    def run(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                self._session(conn)
            except (OSError, ConnectionError):
                pass
            finally:
                conn.close()

    def _session(self, conn):
        conn.settimeout(10)
        playing = False
        buf = b""
        while not self._stop:
            if playing:
                self._stream(conn)
                playing = False
                continue
            while b"\r\n\r\n" not in buf:
                chunk = conn.recv(4096)
                if not chunk:
                    return
                buf += chunk
            head, _, buf = buf.partition(b"\r\n\r\n")
            lines = head.decode().split("\r\n")
            method, url, _ = lines[0].split(" ", 2)
            cseq = next((ln.split(":")[1].strip() for ln in lines
                         if ln.lower().startswith("cseq")), "0")

            def reply(extra="", body=""):
                msg = (f"RTSP/1.0 200 OK\r\nCSeq: {cseq}\r\n" + extra
                       + (f"Content-Length: {len(body)}\r\n" if body
                          else "") + "\r\n" + body)
                conn.sendall(msg.encode())

            if method == "OPTIONS":
                reply("Public: OPTIONS, DESCRIBE, SETUP, PLAY, TEARDOWN\r\n")
            elif method == "DESCRIBE":
                reply("Content-Type: application/sdp\r\n", self._sdp())
            elif method == "SETUP":
                reply("Transport: RTP/AVP/TCP;unicast;interleaved=0-1\r\n"
                      "Session: 12345678\r\n")
            elif method == "PLAY":
                reply("Session: 12345678\r\n")
                playing = True
            elif method == "TEARDOWN":
                self.teardown_seen = True
                reply("Session: 12345678\r\n")
                return

    def _stream(self, conn):
        if self.codec == "MPEG4-GENERIC":
            self._stream_aac(conn)
            return
        import select

        seq = 0
        ts = 0
        for start in range(0, len(self.pcm), self.samples_per_packet):
            if self._stop:
                return
            # interleaved inbound request (TEARDOWN) during playback
            r, _, _ = select.select([conn], [], [], 0)
            if r:
                try:
                    data = conn.recv(4096)
                except OSError:
                    return
                if not data:
                    return
                if b"TEARDOWN" in data:
                    self.teardown_seen = True
                    return
            chunk = self.pcm[start:start + self.samples_per_packet]
            if self.codec == "L16":
                payload = chunk.astype(">i2").tobytes()
            elif self.codec == "PCMU":
                payload = _mulaw_encode(chunk)
            else:
                payload = _alaw_encode(chunk)
            rtp = struct.pack(">BBHII", 0x80, 97 if self.codec == "L16"
                              else {"PCMU": 0, "PCMA": 8}[self.codec],
                              seq & 0xFFFF, ts, 0xDEADBEEF) + payload
            conn.sendall(b"$" + bytes([0])
                         + struct.pack(">H", len(rtp)) + rtp)
            seq += 1
            ts += len(chunk)
            if self.realtime:
                time.sleep(self.samples_per_packet / self.rate)
        # hold the connection open briefly so the client drains
        time.sleep(0.3)

    def _stream_aac(self, conn):
        """RFC 3640 AAC-hbr: one AU per RTP packet, 16-bit AU-headers
        section (size<<3 | index 0)."""
        seq = 0
        ts = 0
        for pkt in self.aac_packets:
            if self._stop:
                return
            au_header = (len(pkt) << 3).to_bytes(2, "big")
            payload = (16).to_bytes(2, "big") + au_header + pkt
            rtp = struct.pack(">BBHII", 0x80, 96, seq & 0xFFFF, ts,
                              0xDEADBEEF) + payload
            conn.sendall(b"$" + bytes([0])
                         + struct.pack(">H", len(rtp)) + rtp)
            seq += 1
            ts += 1024
            if self.realtime:
                time.sleep(1024 / self.rate)
        time.sleep(0.3)

    def stop(self):
        self._stop = True
        self._srv.close()


def _mulaw_encode(pcm: np.ndarray) -> bytes:
    """Inverse of the decode table (nearest-entry encode; exact for table
    values — used to round-trip-test the decoder)."""
    out = np.empty(len(pcm), np.uint8)
    for i, v in enumerate(pcm):
        out[i] = int(np.argmin(np.abs(MULAW.astype(np.int32) - int(v))))
    return out.tobytes()


def _alaw_encode(pcm: np.ndarray) -> bytes:
    out = np.empty(len(pcm), np.uint8)
    for i, v in enumerate(pcm):
        out[i] = int(np.argmin(np.abs(ALAW.astype(np.int32) - int(v))))
    return out.tobytes()


# -- unit: SDP + codecs ---------------------------------------------------------------

def test_parse_sdp_dynamic_and_static():
    sdp = ("v=0\r\nm=video 0 RTP/AVP 96\r\na=control:trackV\r\n"
           "m=audio 0 RTP/AVP 97\r\na=rtpmap:97 L16/48000/2\r\n"
           "a=control:trackA\r\n")
    a = parse_sdp_audio(sdp)
    assert a == {"payload_type": 97, "codec": "L16", "rate": 48000,
                 "channels": 2, "control": "trackA", "fmtp": {}}
    a = parse_sdp_audio("m=audio 0 RTP/AVP 0\r\n")
    assert a["codec"] == "PCMU" and a["rate"] == 8000


def test_g711_tables_roundtrip():
    # canonical G.711 anchors (Sun g711.c semantics)
    assert MULAW[0xFF] == 0                      # µ-law silence
    assert MULAW[0x80] == 32124                  # max positive
    assert MULAW[0x00] == -32124                 # max negative
    assert ALAW[0x55] == -8 and ALAW[0xD5] == 8  # A-law ±min around zero
    assert ALAW[0xAA] == 32256 and ALAW[0x2A] == -32256   # A-law extremes
    # round-trip through the nearest-entry encoder
    sig = (np.sin(np.arange(200) / 5.0) * 12000).astype(np.int16)
    dec = decode_payload("PCMU", _mulaw_encode(sig), 1)
    assert np.mean(np.abs(dec.astype(np.int32) - sig)) < 400  # G.711 SNR
    dec = decode_payload("PCMA", _alaw_encode(sig), 1)
    assert np.mean(np.abs(dec.astype(np.int32) - sig)) < 400


def test_decode_l16_stereo_downmix():
    stereo = np.array([100, 300, -100, -300], np.int16)  # L,R,L,R
    dec = decode_payload("L16", stereo.astype(">i2").tobytes(), 2)
    np.testing.assert_array_equal(dec, [200, -200])


# -- e2e: server → client → engine ------------------------------------------------------

SPEC = ModelSpec(model_id="M8K", display_name="m", sample_rate=8000,
                 clip_seconds=1.0, num_species=3)


def _run_e2e(codec):
    t = np.arange(8000 * 3) / 8000.0
    sig = (9000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    srv = MiniRtspServer(sig, rate=8000, codec=codec)
    srv.start()
    eng = AudioEngine([SPEC])
    src = RtspSource(eng, srv.url, source_id="cam1")
    src.start()
    try:
        deadline = time.time() + 15
        windows = []
        while time.time() < deadline and len(windows) < 3:
            windows += eng.collect_ready()
            time.sleep(0.05)
        assert len(windows) >= 3, f"only {len(windows)} windows arrived"
        model_id, w, sid, start, rate = windows[1]
        assert sid == "cam1" and rate == 8000 and len(w) == 8000
        # signal fidelity: dominant frequency is the 440 Hz tone
        spec = np.abs(np.fft.rfft(w.astype(np.float64)))
        spec[0] = 0
        peak_hz = np.argmax(spec) * 8000 / len(w)
        assert abs(peak_hz - 440) < 5, peak_hz
        # AAC packs 1024 samples/AU (3 s @ 8 kHz ≈ 24 packets); PCM
        # codecs send 20 ms packets (150)
        min_packets = 20 if codec == "MPEG4-GENERIC" else 50
        assert src.codec == codec and src.packets > min_packets
    finally:
        src.stop()
        srv.stop()


def test_rtsp_e2e_l16():
    _run_e2e("L16")


def test_rtsp_e2e_pcmu():
    _run_e2e("PCMU")


def test_rtsp_e2e_aac():
    """AAC camera audio (RFC 3640 MPEG4-GENERIC): SDP fmtp config drives
    the native depacketizer + persistent libavcodec decoder; the decoded
    440 Hz tone must survive end-to-end into analysis windows."""
    from birdnet_go_tpu.audio import aacenc

    if not aacenc.available():
        import pytest

        pytest.skip("libavcodec AAC unavailable")
    _run_e2e("MPEG4-GENERIC")


def test_aac_depacketizer_parses_au_headers():
    """Unit: multi-AU payload with size/index headers decodes every AU."""
    from birdnet_go_tpu.audio import aacenc
    from birdnet_go_tpu.audio.rtsp import AacDepacketizer

    if not aacenc.available():
        import pytest

        pytest.skip("libavcodec AAC unavailable")
    t = np.arange(48000) / 48000.0
    sig = (9000 * np.sin(2 * np.pi * 880 * t)).astype(np.int16)
    packets, asc = aacenc.encode_aac(sig, 48000)
    dep = AacDepacketizer(48000, 1, {"config": asc.hex(),
                                     "sizelength": "13",
                                     "indexlength": "3",
                                     "indexdeltalength": "3"})
    # two AUs in one RTP payload: 2 headers × 16 bits
    a, b = packets[2], packets[3]
    payload = (32).to_bytes(2, "big") \
        + (len(a) << 3).to_bytes(2, "big") \
        + (len(b) << 3).to_bytes(2, "big") + a + b
    # prime the decoder with the first packets (MDCT overlap)
    for p in packets[:2]:
        dep.decode((16).to_bytes(2, "big")
                   + (len(p) << 3).to_bytes(2, "big") + p)
    pcm = dep.decode(payload)
    assert len(pcm) == 2048
    dep.close()


def test_rtsp_stop_sends_teardown():
    """Stopping the client mid-stream exits cleanly and sends TEARDOWN
    (a realtime-paced server keeps the connection live)."""
    sig = np.zeros(8000 * 60, np.int16)
    srv = MiniRtspServer(sig, rate=8000, codec="L16", realtime=True)
    srv.start()
    eng = AudioEngine([SPEC])
    src = RtspSource(eng, srv.url, source_id="cam2")
    src.start()
    deadline = time.time() + 10
    while src.packets < 5 and time.time() < deadline:
        time.sleep(0.05)
    assert src.packets >= 5
    src.stop()
    deadline = time.time() + 5
    while not srv.teardown_seen and time.time() < deadline:
        time.sleep(0.05)
    srv.stop()
    assert srv.teardown_seen


def test_rtsp_reconnects_with_backoff():
    # server that dies immediately → client retries, restarts counted
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def killer():
        for _ in range(3):
            try:
                c, _ = srv.accept()
                c.close()
            except OSError:
                return

    threading.Thread(target=killer, daemon=True).start()
    eng = AudioEngine([SPEC])
    src = RtspSource(eng, f"rtsp://127.0.0.1:{port}/x", source_id="dead")
    src.start()
    deadline = time.time() + 8
    while src.restarts < 2 and time.time() < deadline:
        time.sleep(0.05)
    src.stop()
    srv.close()
    assert src.restarts >= 2


def test_rtsp_to_detection_full_app(tmp_path):
    """The MediaMTX-style loop the reference tests with containers:
    RTSP server → native client source → engine → device loop →
    processor → datastore detection."""
    from tests.test_app_integration import tiny_app  # noqa: F401

    # build the app manually (fixture is function-scoped; reuse its parts)
    import socket as _s

    from birdnet_go_tpu.app import Application
    from birdnet_go_tpu.config.settings import ModelSettings, Settings
    from birdnet_go_tpu.inference import loader
    import birdnet_go_tpu.app as app_mod

    from tests.test_app_integration import tiny_app as _fixture  # noqa

    # tiny model loader (same double the app fixture uses)
    import jax
    import jax.numpy as jnp

    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import (
        BlockSpec,
        EfficientNetConfig,
    )
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny_load_model(model_id, checkpoint=None, seed=0, **kw):
        m = BirdNETv24(num_species=6,
                       mel=MelConfig(sample_rate=48000, n_fft=256, hop=8192,
                                     n_mels=16),
                       compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                                   embedding_dim=16, num_classes=6)
        return m, m.init(jax.random.PRNGKey(0))

    real_load = app_mod.load_model
    app_mod.load_model = tiny_load_model
    try:
        # a 48 kHz tone stream over RTSP (L16)
        t = np.arange(48000 * 12) / 48000.0
        sig = (8000 * np.sin(2 * np.pi * 2000 * t)).astype(np.int16)
        srv = MiniRtspServer(sig, rate=48000, codec="L16", packet_ms=20,
                             realtime=False)
        srv.start()

        s = Settings()
        s.models = [ModelSettings(model_id="BirdNET_V2.4", threshold=0.0)]
        s.database.path = str(tmp_path / "rtsp.db")
        s.export.enabled = False
        s.webserver.enabled = False
        s.deep_detection.level = 0
        s.export.clip_length_seconds = 4.0
        s.export.pre_capture_seconds = 1.0
        s.realtime.tick_ms = 20
        s.realtime.max_batch = 8
        s.realtime.sources = [{"type": "rtsp", "url": srv.url,
                               "id": "ipcam", "client": "native"}]
        app = Application(s)
        app.setup()
        app.start(warmup=False)
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                app.processor.flush(now=time.time() + 1e6)
                if app.datastore.count_detections() > 0:
                    break
                time.sleep(0.3)
            assert app.datastore.count_detections() > 0
            rows = app.datastore.recent_detections(3)
            assert rows[0]["source_id"] == "ipcam"
        finally:
            app.stop()
            srv.stop()
    finally:
        app_mod.load_model = real_load


def test_aac_depacketizer_asymmetric_index_lengths():
    """indexLength != indexDeltaLength: non-first AU headers are
    sizeLength+indexDeltaLength bits — a fixed stride would silently
    drop the final AU of every multi-AU packet (review finding)."""
    from birdnet_go_tpu.audio import aacenc
    from birdnet_go_tpu.audio.rtsp import AacDepacketizer

    if not aacenc.available():
        import pytest

        pytest.skip("libavcodec AAC unavailable")
    t = np.arange(48000) / 48000.0
    sig = (9000 * np.sin(2 * np.pi * 880 * t)).astype(np.int16)
    packets, asc = aacenc.encode_aac(sig, 48000)
    dep = AacDepacketizer(48000, 1, {"config": asc.hex(),
                                     "sizelength": "13",
                                     "indexlength": "3",
                                     "indexdeltalength": "1"})
    for p in packets[:2]:
        dep.decode((16).to_bytes(2, "big")
                   + (len(p) << 3).to_bytes(2, "big") + p)
    # three AUs: headers are 16 + 14 + 14 = 44 bits
    a, b, c = packets[2], packets[3], packets[4]
    hdr = (len(a) << 3) << (14 + 14)
    hdr |= (len(b) << 1) << 14
    hdr |= (len(c) << 1)
    n_hdr_bytes = (44 + 7) // 8                  # 6 bytes
    hdr_bytes = (hdr << (n_hdr_bytes * 8 - 44)).to_bytes(n_hdr_bytes,
                                                         "big")
    payload = (44).to_bytes(2, "big") + hdr_bytes + a + b + c
    pcm = dep.decode(payload)
    assert len(pcm) == 3 * 1024                  # ALL three AUs decoded
    dep.close()


def test_rtsp_multimodel_consensus_full_app(tmp_path):
    """North-star config 5 (BASELINE.json configs[4]): RTSP streams ×
    {BirdNET_V2.4 48k/3s, Perch_V2 32k/5s} through ONE Application —
    shared ingest fans into per-model analysis buffers at native rates,
    the device loop runs both batchers, and the processor's pending map
    merges per-model hits so stored detections carry model_contributions
    from BOTH families (reference orchestrator.go:499 +
    processor.go:203-229)."""
    import jax
    import jax.numpy as jnp

    import birdnet_go_tpu.app as app_mod
    from birdnet_go_tpu.app import Application
    from birdnet_go_tpu.config.settings import ModelSettings, Settings
    from birdnet_go_tpu.models.birdnet_v24 import BirdNETv24
    from birdnet_go_tpu.models.efficientnet import (
        BlockSpec,
        EfficientNetConfig,
    )
    from birdnet_go_tpu.models.perch_v2 import PerchV2
    from birdnet_go_tpu.ops.melspec import MelConfig

    def tiny_load_model(model_id, checkpoint=None, seed=0, **kw):
        if model_id == "Perch_V2":
            m = PerchV2(num_species=6,
                        mel=MelConfig(sample_rate=32000, n_fft=256,
                                      hop=8192, n_mels=16),
                        compute_dtype=jnp.float32)
        else:
            m = BirdNETv24(num_species=6,
                           mel=MelConfig(sample_rate=48000, n_fft=256,
                                         hop=8192, n_mels=16),
                           compute_dtype=jnp.float32)
        m.net = EfficientNetConfig(blocks=(BlockSpec(1, 8, 3, 2, 1),),
                                   embedding_dim=16, num_classes=6)
        return m, m.init(jax.random.PRNGKey(0))

    real_load = app_mod.load_model
    app_mod.load_model = tiny_load_model
    try:
        t = np.arange(48000 * 14) / 48000.0
        sig = (8000 * np.sin(2 * np.pi * 1500 * t)).astype(np.int16)
        srv = MiniRtspServer(sig, rate=48000, codec="L16", packet_ms=20,
                             realtime=False)
        srv.start()

        s = Settings()
        # 6 synthetic species in BOTH families → identical label names →
        # the same scientific name accumulates contributions from both
        s.models = [ModelSettings(model_id="BirdNET_V2.4", threshold=0.0),
                    ModelSettings(model_id="Perch_V2", threshold=0.0)]
        s.database.path = str(tmp_path / "consensus.db")
        s.export.enabled = False
        s.webserver.enabled = False
        s.deep_detection.level = 0
        s.export.clip_length_seconds = 4.0
        s.export.pre_capture_seconds = 1.0
        s.realtime.tick_ms = 20
        s.realtime.max_batch = 8
        s.realtime.sources = [{"type": "rtsp", "url": srv.url,
                               "id": "ipcam", "client": "native"}]
        app = Application(s)
        app.setup()
        app.start(warmup=False)
        try:
            # wait until both models have produced windows, then flush
            deadline = time.time() + 40
            multi = None
            while time.time() < deadline:
                app.processor.flush(now=time.time() + 1e6)
                for row in app.datastore.recent_detections(20):
                    full = app.datastore.get_detection(row["id"])
                    models = {c["model_id"] for c in full["contributions"]}
                    if {"BirdNET_V2.4", "Perch_V2"} <= models:
                        multi = full
                        break
                if multi:
                    break
                time.sleep(0.4)
            assert multi is not None, "no cross-model consensus detection"
            assert multi["source_id"] == "ipcam"
            # both families contributed real hit counts
            by_model = {c["model_id"]: c for c in multi["contributions"]}
            assert by_model["BirdNET_V2.4"]["hit_count"] >= 1
            assert by_model["Perch_V2"]["hit_count"] >= 1
        finally:
            app.stop()
            srv.stop()
    finally:
        app_mod.load_model = real_load

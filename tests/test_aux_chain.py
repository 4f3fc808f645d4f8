"""Name-resolution chain (openfauna aliases, speciesdict, ebird client),
Wunderground, update checker, telemetry, EnhancedError, succession."""

import gzip
import json
import time

import pytest

from birdnet_go_tpu.taxonomy import openfauna, speciesdict


@pytest.fixture(autouse=True)
def _reset_openfauna():
    openfauna.reset_cache()
    yield
    openfauna.reset_cache()


def test_openfauna_alias_resolution():
    aliases = openfauna.load_aliases()
    if not aliases:
        pytest.skip("openfauna dataset not mounted")
    # a documented reclassification from the dataset
    assert openfauna.canonical_name("Accipiter badius") == "Tachyspiza badia"
    assert openfauna.canonical_name("ACCIPITER BADIUS") == "Tachyspiza badia"
    # identity for canonical / unknown names
    assert openfauna.canonical_name("Turdus merula") == "Turdus merula"
    assert openfauna.canonical_name("") == ""


def test_openfauna_metadata():
    meta = openfauna.species_metadata("Abeillia abeillei")
    if meta is None:
        pytest.skip("openfauna dataset not mounted")
    assert meta["class"] == "Aves"
    assert meta["family"] == "Trochilidae"


def test_processor_canonicalizes_cross_model_names():
    """Two models emitting legacy vs canonical names merge into ONE pending
    detection (the alias map's purpose — consensus keys on canonical)."""
    if not openfauna.load_aliases():
        pytest.skip("openfauna dataset not mounted")
    from birdnet_go_tpu.taxonomy.labels import LabelSet, Species
    from tests.test_processor import make_processor

    p, s, now = make_processor()
    legacy = LabelSet(species=[Species("Accipiter badius", "Shikra")])
    canon = LabelSet(species=[Species("Tachyspiza badia", "Shikra")])
    p.labels_by_model["M_legacy"] = legacy
    p.labels_by_model["M_canon"] = canon
    from birdnet_go_tpu.config.settings import ModelSettings

    p._model_settings["M_legacy"] = ModelSettings(model_id="M_legacy",
                                                  threshold=0.5)
    p._model_settings["M_canon"] = ModelSettings(model_id="M_canon",
                                                 threshold=0.5)
    from birdnet_go_tpu.analysis.processor import WindowPrediction

    for model in ("M_legacy", "M_canon"):
        p.submit(WindowPrediction(source_id="s", model_id=model,
                                  start_time=1000.0, end_time=1003.0,
                                  indices=[0], confidences=[0.9]))
    pending = p.pending_snapshot()
    assert len(pending) == 1                       # merged, not two entries
    assert pending[0].detection.species.scientific == "Tachyspiza badia"
    assert set(pending[0].contributions) == {"M_legacy", "M_canon"}


def test_speciesdict_precompressed():
    locales = speciesdict.available_locales()
    if not locales:
        pytest.skip("speciesdict dataset not mounted")
    assert "en" in locales
    blob = speciesdict.compressed_dictionary("en_us")
    assert blob is not None and blob[:2] == b"\x1f\x8b"   # gzip magic
    d = json.loads(gzip.decompress(blob))
    assert len(d) > 1000


# -- ebird client -----------------------------------------------------------------------

class _FakeResp:
    def __init__(self, payload):
        self._p = payload

    def json(self):
        return self._p

    def raise_for_status(self):
        pass


class _FakeSession:
    def __init__(self, payload):
        self.payload = payload
        self.calls = []

    def get(self, url, params=None, headers=None):
        self.calls.append((url, params, headers))
        return _FakeResp(self.payload)


def test_ebird_client_taxonomy_and_cache():
    from birdnet_go_tpu.integrations.ebird import EBirdClient

    rows = [{"sciName": "Turdus merula", "speciesCode": "eurbla",
             "comName": "Eurasian Blackbird"}]
    sess = _FakeSession(rows)
    c = EBirdClient(api_token="KEY", session=sess)
    assert c.species_code("Turdus merula") == "eurbla"
    assert sess.calls[0][2]["X-eBirdApiToken"] == "KEY"
    c.taxonomy()                                   # cache hit, no new call
    assert len(sess.calls) == 1
    obs = c.recent_observations(52.5, 13.4)
    assert obs == rows and len(sess.calls) == 2


# -- wunderground ------------------------------------------------------------------------

def test_wunderground_provider_parses_pws():
    from birdnet_go_tpu.integrations.weather import WundergroundProvider

    payload = {"observations": [{
        "epoch": 1700000000, "humidity": 81, "winddir": 200,
        "metric": {"temp": 12.5, "pressure": 1013.2, "windSpeed": 18.0},
    }]}
    p = WundergroundProvider("KSTATION1", "key", session=_FakeSession(payload))
    (obs,) = p.fetch()
    assert obs.temperature == 12.5
    assert obs.humidity == 81
    assert obs.wind_speed == pytest.approx(5.0)     # km/h → m/s
    assert "KSTATION1" in obs.description


# -- update checker -------------------------------------------------------------------------

def test_update_checker(monkeypatch):
    from birdnet_go_tpu.utils import update

    update._cache = None
    sess = _FakeSession({"tag_name": "v99.0.0",
                         "html_url": "https://example/rel"})
    out = update.check_for_update(session=sess)
    assert out["update_available"] is True and out["latest"] == "99.0.0"
    # cached: second call makes no request
    update.check_for_update(session=sess)
    assert len(sess.calls) == 1
    assert update.is_newer("0.0.1", "0.1.0") is False
    update._cache = None


# -- telemetry + enhanced errors --------------------------------------------------------------

def test_enhanced_error_taxonomy_feeds_error_buffer():
    import logging

    from birdnet_go_tpu.utils import errors
    from birdnet_go_tpu.utils.health import GLOBAL_ERROR_BUFFER

    logging.getLogger("birdnet_tpu.datastore").addHandler(
        GLOBAL_ERROR_BUFFER)
    err = errors.new("connection refused").component("datastore") \
        .category(errors.Category.DATABASE).context("host", "db1").build()
    assert err.category == "database"
    assert "[datastore/database]" in str(err)
    recent = GLOBAL_ERROR_BUFFER.recent(5)
    assert any("connection refused" in r["message"] for r in recent)


def test_error_ring_surfaces_taxonomy_fields():
    """ErrorBuilder.build() logs the EnhancedError object; the ring entry
    must carry component/category/context so /system/errors can show
    categorized failures (the taxonomy existed but no production path
    exercised it — now backup/mqtt/ffmpeg/model-load/source-start do)."""
    from birdnet_go_tpu.utils import errors
    from birdnet_go_tpu.utils.health import GLOBAL_ERROR_BUFFER
    import logging

    logging.getLogger("birdnet_tpu.testcomp").addHandler(GLOBAL_ERROR_BUFFER)
    errors.new("stream produces no data").component("testcomp") \
        .category(errors.Category.NETWORK).context("source_id", "cam9") \
        .build()
    entry = next(r for r in GLOBAL_ERROR_BUFFER.recent(10)
                 if "cam9" in str(r))
    assert entry["component"] == "testcomp"
    assert entry["category"] == "network"
    assert entry["context"] == {"source_id": "cam9"}


def test_backup_failure_is_tagged(tmp_path, monkeypatch):
    """A failing backup run lands a FILE_IO-tagged entry in the ring
    (reference: internal/errors feeding telemetry from backup)."""
    from birdnet_go_tpu.utils import backup as backup_mod
    from birdnet_go_tpu.utils.health import GLOBAL_ERROR_BUFFER
    import logging

    logging.getLogger("birdnet_tpu.backup").addHandler(GLOBAL_ERROR_BUFFER)
    runner = backup_mod.BackupManager.__new__(backup_mod.BackupManager)
    runner.failures = 0
    boom = RuntimeError("disk full on target")
    runner.run_once = lambda: (_ for _ in ()).throw(boom)

    class _Cfg:
        interval_hours = 0.00001
    runner.config = _Cfg()
    import threading
    runner._stop = threading.Event()
    t = threading.Thread(target=runner._run, daemon=True)
    t.start()
    deadline = time.time() + 5
    while runner.failures == 0 and time.time() < deadline:
        time.sleep(0.02)
    runner._stop.set()
    t.join(timeout=2)
    assert runner.failures >= 1
    entry = next(r for r in GLOBAL_ERROR_BUFFER.recent(20)
                 if "disk full" in r["message"])
    assert entry.get("category") == "file-io"
    assert entry.get("component") == "backup"


def test_telemetry_scrub_dedup_and_envelope():
    from birdnet_go_tpu.utils import telemetry
    from birdnet_go_tpu.utils.errors import EnhancedError

    sent = []

    class _Sess:
        def post(self, url, content=b"", headers=None):
            sent.append((url, content, headers))

    telemetry.configure("https://abc123@o1.ingest.example/42",
                        enabled=True, session=_Sess())
    err = EnhancedError("login failed password=hunter2 at 10.0.0.5",
                        component="mqtt", category="network")
    assert telemetry.capture_error(err)
    assert not telemetry.capture_error(err)        # deduplicated
    deadline = time.time() + 5
    while not sent and time.time() < deadline:
        time.sleep(0.02)
    telemetry.configure(None)                      # stop worker
    assert sent, "envelope was not posted"
    url, content, headers = sent[0]
    assert url.endswith("/api/42/envelope/")
    assert b"hunter2" not in content and b"10.0.0.5" not in content
    assert b"password=***" in content and b"x.x.x.x" in content
    assert "sentry_key=abc123" in headers["X-Sentry-Auth"]
    assert telemetry.stats() == {"enabled": False}


def test_telemetry_disabled_is_noop():
    from birdnet_go_tpu.utils import telemetry
    from birdnet_go_tpu.utils.errors import EnhancedError

    telemetry.configure(None)
    assert telemetry.capture_error(EnhancedError("x")) is False


# -- succession analytics ------------------------------------------------------------------------

def test_succession_analytics(tmp_path):
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    ds = Datastore(tmp_path / "s.db")
    jan = 1767225600.0                             # 2026-01-01
    feb = jan + 31 * 86400
    for ts, sci, com in [(jan, "Turdus merula", "Blackbird"),
                         (jan, "Turdus merula", "Blackbird"),
                         (jan + 3600, "Parus major", "Great Tit"),
                         (feb, "Parus major", "Great Tit")]:
        ds.insert_detection(_detection(sci=sci, common=com, ts=ts))
    out = ds.succession()
    assert len(out) == 2
    assert out[0]["month"] == "2026-01" and out[0]["total"] == 3
    top = out[0]["species"][0]
    assert top["scientific_name"] == "Turdus merula"
    assert top["share"] == pytest.approx(2 / 3, abs=1e-3)
    ds.close()


def test_bird_clip_downsampled_from_shared_bat_source(tmp_path):
    """Bird detections captured through a 256 kHz (bat-microphone)
    source export at 48 kHz; the bat model's own clips keep the native
    rate (reference: export.go)."""
    import time as _time

    import numpy as np

    from birdnet_go_tpu.analysis.actions import SaveAudioAction
    from birdnet_go_tpu.audio.buffers import CaptureBuffer
    from birdnet_go_tpu.audio.wav import read_wav

    cb = CaptureBuffer(sample_rate=256000, capacity_seconds=4.0)
    t0 = _time.time() - 3.0
    tone = (10000 * np.sin(2 * np.pi * 2000.0
                           * np.arange(256000 * 3) / 256000)).astype(np.int16)
    cb.write(tone, timestamp=t0)

    out = tmp_path / "bird.wav"
    SaveAudioAction(capture_buffer=cb, start_time=t0 + 0.5,
                    end_time=t0 + 2.5, out_path=out,
                    sample_rate=256000, downsample_to=48000).execute()
    samples, info = read_wav(out)
    assert info.sample_rate == 48000
    assert abs(len(samples) - 2 * 48000) < 4800       # ~2 s at 48 kHz

    out2 = tmp_path / "bat.wav"
    SaveAudioAction(capture_buffer=cb, start_time=t0 + 0.5,
                    end_time=t0 + 2.5, out_path=out2,
                    sample_rate=256000).execute()      # no downsample
    _, info2 = read_wav(out2)
    assert info2.sample_rate == 256000

"""Spectrogram endpoint + daylight filter integration."""

import json
import urllib.request

import numpy as np
import pytest

from birdnet_go_tpu.analysis.processor import Processor, WindowPrediction
from birdnet_go_tpu.config.settings import ModelSettings, Settings
from tests.test_app_integration import tiny_app  # fixture reuse
from tests.test_processor import make_labels

M = "BirdNET_V2.4"


def test_spectrogram_generated_on_demand(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port

    # seed a detection + its clip WAV
    from pathlib import Path

    from birdnet_go_tpu.audio.wav import write_wav
    from tests.test_realtime_core import _detection

    clips = Path(app.settings.export.path)
    clips.mkdir(parents=True, exist_ok=True)
    t = np.arange(48000) / 48000.0
    write_wav(clips / "c1.wav",
              (0.5 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32), 48000)
    det_id = app.datastore.insert_detection(_detection(), clip_name="c1.wav")

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/spectrogram/{det_id}?size=sm",
            timeout=30) as r:
        body = r.read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert (clips / "c1.png").exists()           # cached for next time

    # cached path served directly
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/media/spectrogram/c1.png",
            timeout=10) as r:
        assert r.read()[:4] == b"\x89PNG"[:4]

    # missing id → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/spectrogram/99999", timeout=10)
    assert e.value.code == 404
    app.stop()


def _daylight_processor(**df):
    """Processor with the daylight filter targeting the owl (index 1)."""
    s = Settings()
    s.models = [ModelSettings(model_id=M, threshold=0.5)]
    s.daylight_filter.enabled = True
    s.daylight_filter.species = df.pop("species", ["Strix aluco"])
    s.daylight_filter.offset_hours = df.pop("offset_hours", 0.0)
    s.location.latitude = df.pop("latitude", 52.5)
    s.location.longitude = 13.4
    assert not df
    return s, Processor(s, {M: make_labels()})


import datetime as _dt  # noqa: E402

_NOON = _dt.datetime(2026, 6, 1, 12, 0,
                     tzinfo=_dt.timezone.utc).timestamp()
_NIGHT = _dt.datetime(2026, 6, 1, 0, 30,
                      tzinfo=_dt.timezone.utc).timestamp()


def _owl_at(p, when, idx=1):
    p.submit(WindowPrediction(source_id="s", model_id=M, start_time=when,
                              end_time=when + 3, indices=[idx],
                              confidences=[0.9]))
    return p.flush(now=when + 100)


def test_daylight_filter_discards_listed_species_in_daylight():
    """checkDaylightFilter contract (daylight_filter_test.go): a LISTED
    (nocturnal) species detected inside the daylight window is the
    likely misidentification and is discarded; the same species at
    night passes, and unlisted species pass at any hour."""
    s, p = _daylight_processor()
    assert _owl_at(p, _NOON) == []                 # owl at noon: discarded
    assert p.stats.discard_reasons.get("daylight filter") == 1
    assert len(_owl_at(p, _NIGHT)) == 1            # owl at night: kept
    assert len(_owl_at(p, _NOON, idx=0)) == 1      # blackbird at noon: kept


def test_daylight_filter_offsets_and_inverted_window():
    # positive offset shrinks the window: dawn+offset pushes past an
    # early-morning detection time → that time no longer counts as
    # daylight (TestIsDaylightWithPositiveOffset)
    early = _dt.datetime(2026, 6, 1, 3, 30,       # Berlin civil dawn ~02:40 UTC
                         tzinfo=_dt.timezone.utc).timestamp()
    s, p = _daylight_processor()
    assert _owl_at(p, early) == []                 # inside plain window
    s2, p2 = _daylight_processor(offset_hours=2.0)
    assert len(_owl_at(p2, early)) == 1            # shrunk window: night now
    # negative offset expands the window: late-evening owl now discarded
    late = _dt.datetime(2026, 6, 1, 20, 30,
                        tzinfo=_dt.timezone.utc).timestamp()
    s3, p3 = _daylight_processor(offset_hours=-2.0)
    assert _owl_at(p3, late) == []
    # inverted window (absurd offset): NO time is daylight → all pass
    s4, p4 = _daylight_processor(offset_hours=12.0)
    assert len(_owl_at(p4, _NOON)) == 1            # TestIsDaylightInvertedWindow


def test_daylight_filter_empty_list_and_no_location_inactive():
    # empty species list = exclusionary filter filters NOTHING
    # (TestInitDaylightFilterEmptySpeciesList)
    s, p = _daylight_processor(species=[])
    assert len(_owl_at(p, _NOON)) == 1
    # unconfigured location: filter inactive with a warning
    # (TestInitDaylightFilterUnconfiguredLocation)
    s2, p2 = _daylight_processor(latitude=None)
    assert len(_owl_at(p2, _NOON)) == 1


def test_daylight_filter_resolves_common_names_and_reinit():
    # config entries may be common names (resolveSpeciesFilter), and
    # rebuild is safe to re-call on settings refresh
    # (TestInitDaylightFilterReInitialization)
    s, p = _daylight_processor(species=["Tawny Owl"])
    assert "strix aluco" in p._daylight_species
    assert _owl_at(p, _NOON) == []
    s.daylight_filter.species = []
    p.rebuild_daylight_filter()
    assert p._daylight_species == frozenset()
    assert len(_owl_at(p, _NOON)) == 1


def test_daylight_filter_fails_open_on_sun_error(monkeypatch):
    """suncalc failure → allow the detection (fail open,
    checkDaylightFilter error branch)."""
    import birdnet_go_tpu.utils.suncalc as sc

    s, p = _daylight_processor()

    def boom(*a, **k):
        raise ValueError("no sun today")

    monkeypatch.setattr(sc, "in_daylight_window", boom)
    assert len(_owl_at(p, _NOON)) == 1


def test_clip_filename_layout_table():
    """buildClipPath contract (clip_name_test.go / build_clip_path_test.go):
    year/month nesting, lowercase underscored scientific name, NNp
    confidence, compact UTC-style timestamp with literal Z, optional
    _<dur>s suffix, and never an extension-less / dot-terminated path."""
    import datetime

    from birdnet_go_tpu.analysis.actions import clip_filename
    from birdnet_go_tpu.analysis.results import Detection
    from birdnet_go_tpu.taxonomy.labels import Species

    ts = datetime.datetime(2026, 3, 7, 14, 5, 9)
    d = Detection(species=Species("Strix aluco", "Tawny Owl"),
                  confidence=0.874, begin_seconds=100.0, end_seconds=112.0,
                  model_id="BirdNET_V2.4", source_id="s1", timestamp=ts)
    assert clip_filename(d, "flac") == \
        "2026/03/strix_aluco_87p_20260307T140509Z.flac"
    # duration suffix marks extended-capture session clips
    # (TestGenerateClipNameWithDuration)
    assert clip_filename(d, "wav", duration_seconds=45) == \
        "2026/03/strix_aluco_87p_20260307T140509Z_45s.wav"
    # empty/dotted formats fall back to wav and never end in a dot
    # (TestBuildClipPath_EmptyTypeFallsBackToWav / NeverEndsInDot)
    for bad in ("", " ", ".", ".mp3"):
        name = clip_filename(d, bad)
        assert not name.endswith(".") and "." in name.rsplit("/", 1)[-1]
    assert clip_filename(d, "").endswith(".wav")
    assert clip_filename(d, ".mp3").endswith(".mp3")
    # no timestamp → no year/month prefix (nothing to derive it from)
    d2 = Detection(species=Species("Parus major", "Great Tit"),
                   confidence=0.5, begin_seconds=33.0, end_seconds=45.0,
                   model_id="BirdNET_V2.4", source_id="s1", timestamp=None)
    assert clip_filename(d2, "wav") == "parus_major_50p_33.wav"

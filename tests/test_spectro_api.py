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


def test_daylight_filter_discards_night_detection():
    s = Settings()
    s.models = [ModelSettings(model_id=M, threshold=0.5)]
    s.daylight_filter.enabled = True
    s.location.latitude = 52.5
    s.location.longitude = 13.4
    import datetime

    # 2026-06-01 00:30 UTC in Berlin = night
    night = datetime.datetime(2026, 6, 1, 0, 30,
                              tzinfo=datetime.timezone.utc).timestamp()
    noon = datetime.datetime(2026, 6, 1, 12, 0,
                             tzinfo=datetime.timezone.utc).timestamp()
    p = Processor(s, {M: make_labels()}, clock=lambda: night)
    p.submit(WindowPrediction(source_id="s", model_id=M, start_time=night,
                              end_time=night + 3, indices=[0],
                              confidences=[0.9]))
    assert p.flush(now=night + 100) == []
    assert p.stats.discard_reasons.get("daylight filter") == 1

    # daytime passes
    p.submit(WindowPrediction(source_id="s", model_id=M, start_time=noon,
                              end_time=noon + 3, indices=[0],
                              confidences=[0.9]))
    assert len(p.flush(now=noon + 100)) == 1

    # nocturnal opt-out: owls at night pass
    s.species.config["Strix aluco"] = {"daylight": False}
    p.submit(WindowPrediction(source_id="s", model_id=M, start_time=night,
                              end_time=night + 3, indices=[1],
                              confidences=[0.9]))
    assert len(p.flush(now=night + 100)) == 1

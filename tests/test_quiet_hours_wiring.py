"""Quiet-hours config wiring: settings → scheduler windows → capture
gating (reference: internal/audiocore/schedule/quiet_hours.go — windows
come from config and gate soundcard capture; previously the repo's
scheduler existed but no caller ever populated it)."""

import datetime as dt
import types

import pytest

from birdnet_go_tpu.app import Application
from birdnet_go_tpu.audio.quiet_hours import (
    QuietHoursScheduler,
    QuietWindow,
    parse_windows,
)
from birdnet_go_tpu.config.settings import Settings


# ---------------------------------------------------------------- parsing

def test_parse_windows_dicts_and_strings():
    wins = parse_windows([
        {"start": "22:00", "end": "06:00"},
        "23:30-05:15",
        "sunset+30m to sunrise-30m",
    ])
    assert wins == [
        QuietWindow("22:00", "06:00"),
        QuietWindow("23:30", "05:15"),
        QuietWindow("sunset+30m", "sunrise-30m"),
    ]


def test_parse_windows_empty_and_none():
    assert parse_windows(None) == []
    assert parse_windows([]) == []


@pytest.mark.parametrize("bad", [
    ["22:00"],                     # no end
    ["25:00-06:00"],               # invalid hour
    [{"start": "22:00"}],          # missing end
    ["sunset+30x to sunrise"],     # bad offset unit
])
def test_parse_windows_malformed_raises(bad):
    with pytest.raises(ValueError):
        parse_windows(bad)


# ---------------------------------------------------------- config wiring

def _bare_app(sources, global_windows=()):
    s = Settings()
    s.realtime.sources = sources
    s.realtime.quiet_hours = list(global_windows)
    app = Application(s)
    app.quiet_hours = QuietHoursScheduler(lat=60.0, lon=25.0)
    return app


def test_apply_quiet_windows_global_plus_per_source():
    app = _bare_app(
        sources=[
            {"type": "tone", "id": "t0"},
            {"type": "soundcard", "id": "card0",
             "quiet_hours": ["01:00-02:00"]},
        ],
        global_windows=["22:00-06:00"])
    app._apply_quiet_windows()
    sched = app.quiet_hours
    assert sched._windows["t0"] == [QuietWindow("22:00", "06:00")]
    assert sched._windows["card0"] == [
        QuietWindow("22:00", "06:00"), QuietWindow("01:00", "02:00")]
    assert sched.has_windows()
    # 23:00 UTC is inside the global window for both sources
    when = dt.datetime(2026, 3, 1, 23, 0, tzinfo=dt.timezone.utc)
    assert sched.is_quiet("t0", when) and sched.is_quiet("card0", when)
    assert not sched.is_quiet("t0",
                              dt.datetime(2026, 3, 1, 12, 0,
                                          tzinfo=dt.timezone.utc))


def test_apply_quiet_windows_default_ids_and_bad_entry_skipped():
    app = _bare_app(sources=[{"type": "file", "quiet_hours": ["nonsense"]}],
                    global_windows=["22:00-06:00"])
    app._apply_quiet_windows()          # must not raise
    # id defaults to type+index; bad per-source list falls back to global
    assert app.quiet_hours._windows["file0"] == [
        QuietWindow("22:00", "06:00")]


# --------------------------------------------------------------- gating

class _FakeCapture:
    def __init__(self, sid, kind="audio_card"):
        self.source = types.SimpleNamespace(
            source_id=sid,
            source_type=types.SimpleNamespace(value=kind))
        self.running = True
        self.transitions = []

    def start(self):
        self.running = True
        self.transitions.append("start")

    def stop(self):
        self.running = False
        self.transitions.append("stop")


def test_quiet_gates_stop_and_resume_soundcards_only():
    app = _bare_app(sources=[])
    card = _FakeCapture("card0")
    rtsp = _FakeCapture("cam0", kind="rtsp")
    app._sources = [card, rtsp]

    quiet = {"card0": True, "cam0": True}
    app.quiet_hours.is_quiet = lambda sid, when=None: quiet[sid]

    app._apply_quiet_gates()
    assert card.transitions == ["stop"] and not card.running
    assert rtsp.transitions == []       # non-soundcard never gated

    app._apply_quiet_gates()            # idempotent while still quiet
    assert card.transitions == ["stop"]

    quiet["card0"] = False
    app._apply_quiet_gates()
    assert card.transitions == ["stop", "start"] and card.running
    assert "card0" not in app._quiet_gated


def test_remove_source_clears_gate_entry():
    """A gated source that gets removed/re-added (source reconfigure)
    must not inherit the stale gate entry — it would capture straight
    through its quiet window and then double-start at window end."""
    app = _bare_app(sources=[])
    card = _FakeCapture("card0")
    app._sources = [card]
    app.quiet_hours.is_quiet = lambda sid, when=None: True
    app._apply_quiet_gates()
    assert "card0" in app._quiet_gated
    app._remove_source("card0")
    assert "card0" not in app._quiet_gated


def test_reconfigure_quiet_hours_rebuilds_and_regates():
    app = _bare_app(
        sources=[{"type": "soundcard", "id": "card0",
                  "quiet_hours": ["00:00-12:00", "12:00-00:00"]}])
    card = _FakeCapture("card0")
    app._sources = [card]
    app._reconfigure_quiet_hours()      # all-day windows ⇒ gate now
    assert not card.running
    # dropping the windows on the next reconfigure resumes capture
    app.settings.realtime.sources[0]["quiet_hours"] = []
    app._reconfigure_quiet_hours()
    assert card.running

"""Extended capture (reference: extended_capture.go + conf
ExtendedCaptureSettings): one long clip per continuous calling session,
scaled flush deadlines capped at max_duration, species filter resolved
against the label union, ring sized to hold the longest clip."""

from __future__ import annotations

import pytest

from birdnet_go_tpu.analysis.processor import Processor, WindowPrediction
from birdnet_go_tpu.config.settings import Settings
from birdnet_go_tpu.taxonomy.labels import LabelSet, Species


def _labels():
    return LabelSet(species=[
        Species("Corvus corax", "Common Raven"),
        Species("Parus major", "Great Tit"),
    ])


def _proc(**ec):
    s = Settings()
    s.export.clip_length_seconds = 15.0
    s.export.pre_capture_seconds = 3.0
    s.deep_detection.level = 0
    for k, v in ec.items():
        setattr(s.extended_capture, k, v)
    return Processor(settings=s, labels_by_model={"m": _labels()}), s


def _pred(t, idx=0, conf=0.95):
    return WindowPrediction(source_id="s", model_id="m", start_time=t,
                            end_time=t + 3, indices=[idx],
                            confidences=[conf])


def test_effective_capture_buffer_seconds():
    s = Settings()
    ec = s.extended_capture
    assert ec.effective_capture_buffer_seconds(120, 15, 3) == 120
    ec.enabled = True
    ec.max_duration_seconds = 300
    assert ec.effective_capture_buffer_seconds(120, 15, 3) == 318
    ec.capture_buffer_seconds = 600
    assert ec.effective_capture_buffer_seconds(120, 15, 3) == 600


def test_species_filter_resolution():
    p, _ = _proc(enabled=True, species=["Common Raven", "Parus major",
                                        "Nonexistent thing"])
    assert p._is_extended_species("Corvus corax")      # via common name
    assert p._is_extended_species("parus major")       # case-insensitive
    assert not p._is_extended_species("Turdus merula")
    # empty list = all species
    p2, _ = _proc(enabled=True, species=[])
    assert p2._extended_all and p2._is_extended_species("Anything")
    # disabled = nothing
    p3, _ = _proc(enabled=False)
    assert not p3._is_extended_species("Corvus corax")


def test_scaled_deadline_and_session_span():
    """Deadline scaling (calculateExtendedFlushDeadline): short sessions
    wait max(window, 15 s); medium 30 s; long 60 s; capped at
    max_deadline. The approved detection spans first..last+window."""
    p, s = _proc(enabled=True, species=["Corvus corax"],
                 max_duration_seconds=120)
    t0 = 1000.0
    p.submit(_pred(t0))
    item = p._pending["s:Corvus corax"]
    assert item.extended and item.max_deadline == t0 + 120
    # short session: deadline = now + max(12, 15) = t0 + 15
    assert item.flush_deadline == pytest.approx(t0 + 15)
    # re-detection at +40 s (medium): deadline = now + 30
    p.submit(_pred(t0 + 40))
    assert item.flush_deadline == pytest.approx(t0 + 70)
    # re-detection at +130 s (long): now + 60 capped at max_deadline
    p.submit(_pred(t0 + 130))
    assert item.flush_deadline == pytest.approx(t0 + 120)  # capped

    approved = p.flush(now=t0 + 121)
    assert len(approved) == 1
    d = approved[0]
    assert d.begin_seconds == t0
    # end = last hit + (clip length - pre capture) = t0+130+12
    assert d.end_seconds == pytest.approx(t0 + 142)


def test_normal_species_unaffected():
    p, _ = _proc(enabled=True, species=["Corvus corax"])
    t0 = 2000.0
    p.submit(_pred(t0, idx=1))           # Parus major: not extended
    item = p._pending["s:Parus major"]
    assert not item.extended
    assert item.flush_deadline == pytest.approx(t0 + 12)
    approved = p.flush(now=t0 + 13)
    assert approved and approved[0].end_seconds == pytest.approx(t0 + 12)


def test_species_tracking_window_and_suppression():
    """SpeciesTrackingSettings semantics (conf/config.go:929-936): a
    species stays 'new' for window_days after first detection; duplicate
    notifications suppress for suppression hours."""
    import datetime as dt

    from birdnet_go_tpu.analysis.species_tracker import SpeciesTracker

    tr = SpeciesTracker()
    d0 = dt.date(2026, 6, 1)
    st = tr.observe("Parus major", when=d0, window_days=7)
    assert st.is_new_lifetime
    # still "new" 5 days later
    st = tr.observe("Parus major", when=d0 + dt.timedelta(days=5),
                    window_days=7)
    assert st.is_new_lifetime
    # day 7 is still inside the inclusive window (status.go:139 <=)
    st = tr.observe("Parus major", when=d0 + dt.timedelta(days=7),
                    window_days=7)
    assert st.is_new_lifetime
    # no longer new after the window
    st = tr.observe("Parus major", when=d0 + dt.timedelta(days=8),
                    window_days=7)
    assert not st.is_new_lifetime
    # window_days=0: same-day re-detection still new, next day not
    st2 = tr.observe("Turdus merula", when=d0, window_days=0)
    assert st2.is_new_lifetime
    st2 = tr.observe("Turdus merula", when=d0, window_days=0)
    assert st2.is_new_lifetime
    st2 = tr.observe("Turdus merula", when=d0 + dt.timedelta(days=1),
                     window_days=0)
    assert not st2.is_new_lifetime

    # notification suppression: 168 h default
    assert tr.should_notify("Parus major", now=1000.0,
                            suppression_hours=168)
    assert not tr.should_notify("Parus major", now=1000.0 + 100 * 3600,
                                suppression_hours=168)
    assert tr.should_notify("Parus major", now=1000.0 + 169 * 3600,
                            suppression_hours=168)
    # restart restoration: seeding suppresses within the window
    tr2 = SpeciesTracker()
    tr2.seed_notified("Parus major", 5000.0)
    assert not tr2.should_notify("Parus major", now=5000.0 + 3600,
                                 suppression_hours=168)

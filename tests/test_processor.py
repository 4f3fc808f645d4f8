"""Detection-engine behavior tests (table-driven, mirroring the reference's
processor test strategy — SURVEY.md §4)."""

import pytest

from birdnet_go_tpu.analysis import deep_detection
from birdnet_go_tpu.analysis.dynamic_threshold import DynamicThresholds
from birdnet_go_tpu.analysis.eventtracker import EventTracker
from birdnet_go_tpu.analysis.jobqueue import JobQueue, RetryConfig
from birdnet_go_tpu.analysis.processor import Processor, WindowPrediction
from birdnet_go_tpu.config.settings import ModelSettings, Settings
from birdnet_go_tpu.taxonomy.labels import LabelSet, Species

M = "BirdNET_V2.4"


def make_labels():
    sp = [
        Species("Turdus merula", "Eurasian Blackbird"),        # 0
        Species("Strix aluco", "Tawny Owl"),                   # 1
        Species("Human vocal", "Human vocal"),                 # 2
        Species("Canis familiaris", "Dog"),                    # 3
        Species("Parus major", "Great Tit"),                   # 4
    ]
    return LabelSet(species=sp)


def make_processor(approved_sink=None, **overrides):
    s = Settings()
    s.models = [ModelSettings(model_id=M, threshold=0.5)]
    s.export.clip_length_seconds = 15.0
    s.export.pre_capture_seconds = 3.0
    for k, v in overrides.items():
        # dotted path override, e.g. "privacy_filter.enabled"
        obj = s
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], v)
    now = [1000.0]
    p = Processor(s, {M: make_labels()},
                  on_approved=approved_sink, clock=lambda: now[0])
    return p, s, now


def pred(idx, conf, t=1000.0, source="src1", model=M):
    return WindowPrediction(source_id=source, model_id=model, start_time=t,
                            end_time=t + 3.0, indices=[idx],
                            confidences=[conf])


# -- deep detection math ----------------------------------------------------------

@pytest.mark.parametrize("level,overlap,expected", [
    (0, 0.0, 1),          # off
    (0, 2.9, 1),
    (1, 2.0, 2),          # 6/1.0 × 0.20 = 1.2 → 2
    (2, 2.2, 3),          # 6/0.8 × 0.30 = 2.25 → 3
    (3, 2.4, 5),          # 6/0.6 × 0.50 = 5.0 → 5 (epsilon guard)
    (4, 2.7, 12),         # 6/0.3 × 0.60 = 12.0 → 12
    (5, 2.8, 21),         # 6/0.2 × 0.70 = 21.0 → 21
    (3, 0.0, 1),          # no overlap: 6/3 × 0.5 = 1.0 → 1
    (5, 2.95, 42),        # segment clamps at 0.1: 60 × 0.7 = 42
])
def test_min_detections_table(level, overlap, expected):
    assert deep_detection.min_detections(level, overlap) == expected


# -- threshold & filter stack -------------------------------------------------------

def test_detection_below_threshold_filtered():
    p, _, now = make_processor()
    p.submit(pred(0, 0.4))
    assert p.stats.detections_filtered == 1
    assert p.pending_snapshot() == []


def test_detection_above_threshold_pends_then_approves():
    approved = []
    p, _, now = make_processor(lambda d, item: approved.append(d))
    p.submit(pred(0, 0.9, t=1000.0))
    assert len(p.pending_snapshot()) == 1
    # deadline = 1000 + (15 - 3) = 1012
    assert p.flush(now=1011.9) == []
    out = p.flush(now=1012.1)
    assert len(out) == 1 and out[0].species.scientific == "Turdus merula"
    assert approved and approved[0].confidence == 0.9
    assert p.stats.detections_approved == 1


def test_per_species_threshold_override():
    p, s, _ = make_processor()
    s.species.config["Turdus merula"] = {"threshold": 0.95}
    p.submit(pred(0, 0.9))          # below species override
    assert p.stats.detections_filtered == 1
    p.submit(pred(1, 0.9))          # other species uses model threshold 0.5
    assert len(p.pending_snapshot()) == 1


def test_exclusion_list():
    p, s, _ = make_processor()
    s.species.exclude = ["Turdus merula"]
    p.submit(pred(0, 0.99))
    assert p.stats.detections_filtered == 1


def test_range_filter_inclusion_and_config_include_override():
    p, s, _ = make_processor()
    p.set_included_species({"Strix aluco"})
    p.submit(pred(0, 0.9))          # blackbird not in range → filtered
    assert p.stats.detections_filtered == 1
    p.submit(pred(1, 0.9))          # owl in range
    assert len(p.pending_snapshot()) == 1
    # config include list bypasses the range filter (range_filter.go merge)
    s.species.include = ["Turdus merula"]
    p.submit(pred(0, 0.9))
    assert len(p.pending_snapshot()) == 2


def test_cross_model_consensus_merges_contributions():
    p, s, _ = make_processor()
    s.models.append(ModelSettings(model_id="Perch_V2", threshold=0.5))
    p._model_settings = {m.model_id: m for m in s.models}
    p.labels_by_model["Perch_V2"] = make_labels()
    p.submit(pred(0, 0.6, t=1000.0))
    p.submit(pred(0, 0.8, t=1001.5, model="Perch_V2"))
    items = p.pending_snapshot()
    assert len(items) == 1
    item = items[0]
    assert item.count == 2
    assert set(item.contributions) == {M, "Perch_V2"}
    assert item.best_model_id == "Perch_V2"          # higher max confidence
    assert item.detection.confidence == 0.8


def test_deep_detection_requires_repeats():
    approved = []
    p, s, now = make_processor(lambda d, i: approved.append(d),
                               **{"deep_detection.level": 2})
    s.models[0].overlap = 2.2        # → minDetections 3
    p.submit(pred(0, 0.9, t=1000.0))
    p.submit(pred(0, 0.9, t=1000.8))
    out = p.flush(now=1013.0)
    assert out == []                  # only 2/3 confirmations
    assert p.stats.discard_reasons.get(
        "false positive, matched 2/3 times") == 1
    # now with 3 hits
    for i in range(3):
        p.submit(pred(0, 0.9, t=1020.0 + 0.8 * i))
    assert len(p.flush(now=1033.0)) == 1


def test_privacy_filter_ge_semantics():
    # human detected at exactly the bird's start time must discard (>= not >)
    p, _, _ = make_processor(**{"privacy_filter.enabled": True})
    p.submit(pred(0, 0.9, t=1000.0))
    p.submit(pred(2, 0.06, t=1000.0))        # human vocal, same timestamp
    assert p.flush(now=1013.0) == []
    assert p.stats.discard_reasons.get("privacy filter") == 1


def test_privacy_filter_before_detection_passes():
    p, _, _ = make_processor(**{"privacy_filter.enabled": True})
    p.submit(pred(2, 0.9, t=999.0))          # human before detection start
    p.submit(pred(0, 0.9, t=1000.0))
    assert len(p.flush(now=1013.0)) == 1


def test_privacy_confidence_floor():
    p, _, _ = make_processor(**{"privacy_filter.enabled": True})
    p.submit(pred(0, 0.9, t=1000.0))
    p.submit(pred(2, 0.04, t=1001.0))        # below 0.05 floor: ignored
    assert len(p.flush(now=1013.0)) == 1


def test_human_never_stored_as_detection():
    p, _, _ = make_processor()
    p.submit(pred(2, 0.99))
    assert p.pending_snapshot() == []


def test_dog_bark_filter_window():
    p, _, _ = make_processor(**{"dog_bark_filter.enabled": True})
    p.submit(pred(3, 0.5, t=1000.0))          # dog bark
    p.submit(pred(0, 0.9, t=1100.0))          # 100 s later, within 5 min
    assert p.flush(now=1113.0) == []
    assert p.stats.discard_reasons.get("recent dog bark") == 1
    p.submit(pred(0, 0.9, t=1000.0 + 301.0))  # past the 5 min window
    assert len(p.flush(now=1320.0)) == 1


# -- dynamic thresholds ----------------------------------------------------------------

def test_dynamic_threshold_levels_cooldown_and_expiry():
    """Mirrors dynamic_threshold.go: level = high-conf count (1/2/3+),
    one learning per detection-window cooldown, full reset on expiry."""
    dt = DynamicThresholds(trigger=0.9, floor=0.2, valid_hours=1.0,
                           learning_cooldown_seconds=12.0)
    base = 0.8
    t0 = 10_000.0
    assert dt.adjust(base, M, "X", now=t0) == base
    dt.learn(0.95, M, "X", now=t0)                     # 1st → level 1
    assert dt.adjust(base, M, "X", now=t0) == pytest.approx(0.6)
    dt.learn(0.99, M, "X", now=t0 + 1)                 # within cooldown
    assert dt.adjust(base, M, "X", now=t0 + 1) == pytest.approx(0.6)
    dt.learn(0.99, M, "X", now=t0 + 13)                # 2nd → level 2
    assert dt.adjust(base, M, "X", now=t0 + 13) == pytest.approx(0.4)
    dt.learn(0.99, M, "X", now=t0 + 26)                # 3rd → level 3
    dt.learn(0.99, M, "X", now=t0 + 40)                # stays 3
    assert dt.adjust(base, M, "X", now=t0 + 40) == pytest.approx(0.2)
    # expiry → FULL reset to base (reference resets, not gradual decay)
    assert dt.adjust(base, M, "X", now=t0 + 40 + 3601) == base


def test_dynamic_threshold_timer_extends_during_cooldown():
    # every approved high-conf detection extends expiry even if the level
    # can't move yet (LearnFromApprovedDetection always extends the timer)
    dt = DynamicThresholds(trigger=0.9, valid_hours=1.0,
                           learning_cooldown_seconds=12.0)
    dt.learn(0.95, M, "X", now=0.0)
    dt.learn(0.95, M, "X", now=5.0)      # cooldown: timer → 3605
    assert dt.adjust(0.8, M, "X", now=3603.0) == pytest.approx(0.6)
    assert dt.adjust(0.8, M, "X", now=3606.0) == 0.8


def test_dynamic_threshold_low_conf_does_not_learn():
    dt = DynamicThresholds(trigger=0.9)
    dt.learn(0.85, M, "X", now=0.0)
    assert dt.adjust(0.8, M, "X", now=0.0) == 0.8
    dt.learn(0.90, M, "X", now=0.0)      # == trigger: strictly-above rule
    assert dt.adjust(0.8, M, "X", now=0.0) == 0.8


def test_dynamic_threshold_custom_species_exempt():
    dt = DynamicThresholds(trigger=0.9)
    dt.learn(0.95, M, "X", now=0.0, is_custom=True)    # refuses to learn
    assert dt.adjust(0.8, M, "X", now=0.0) == 0.8
    dt.learn(0.95, M, "X", now=0.0)
    # a custom threshold is returned unchanged even with learned state
    assert dt.adjust(0.7, M, "X", now=0.0, is_custom=True) == 0.7
    assert dt.adjust(0.8, M, "X", now=0.0) == pytest.approx(0.6)


def test_dynamic_threshold_events_emitted():
    events = []
    dt = DynamicThresholds(trigger=0.9, floor=0.2, valid_hours=1.0,
                           on_event=events.append)
    dt.learn(0.95, M, "X", now=0.0, base_threshold=0.8)
    assert events[-1].reason == "high_confidence"
    assert events[-1].new_level == 1
    assert events[-1].new_value == pytest.approx(0.6)
    dt.adjust(0.8, M, "X", now=7200.0)                 # expired
    assert events[-1].reason == "expiry" and events[-1].new_level == 0


def test_dynamic_threshold_clear():
    dt = DynamicThresholds()
    dt.learn(0.95, M, "X", now=0.0)
    dt.learn(0.95, M, "Y", now=0.0)
    assert dt.clear(scientific="X") == 1
    assert dt.adjust(0.8, M, "X", now=0.0) == 0.8
    assert dt.adjust(0.8, M, "Y", now=0.0) < 0.8


# -- event tracker / job queue -----------------------------------------------------------

def test_event_tracker_interval():
    from birdnet_go_tpu.analysis.eventtracker import EventType

    et = EventTracker(default_interval_seconds=15.0)
    assert et.track(EventType.LOG_TO_FILE, "X", now=0.0)
    assert not et.track(EventType.LOG_TO_FILE, "X", now=10.0)
    assert et.track(EventType.LOG_TO_FILE, "X", now=15.5)
    # independent per-action state (eventtracker.go: one handler per type)
    assert et.track(EventType.DATABASE_SAVE, "X", now=10.0)
    assert et.track(EventType.MQTT_PUBLISH, "X", now=10.0)
    # unknown event types refused (reference: missing handler → false)
    assert not et.track("bogus", "X", now=0.0)


def test_event_tracker_species_interval_and_names():
    from birdnet_go_tpu.analysis.eventtracker import EventType

    et = EventTracker(default_interval_seconds=15.0, species_config={
        "Turdus merula": {"interval": 60},
        "Parus major": {"interval": -5},          # negative → default
    })
    t = EventType.LOG_TO_FILE
    # scientific-name lookup, case-insensitive keying
    assert et.track(t, common="", scientific="Turdus merula", now=0.0)
    assert not et.track(t, common="", scientific="TURDUS MERULA", now=30.0)
    assert et.track(t, common="", scientific="Turdus merula", now=61.0)
    assert et.track(t, scientific="Parus major", now=0.0)
    assert et.track(t, scientific="Parus major", now=16.0)   # default 15 s
    # no species key at all → always allowed
    assert et.track(t, now=0.0) and et.track(t, now=0.0)


def test_event_tracker_cleanup_and_reset():
    from birdnet_go_tpu.analysis.eventtracker import EventType

    et = EventTracker(default_interval_seconds=1000.0)
    assert et.track(EventType.LOG_TO_FILE, "X", now=0.0)
    et.reset_event("X", EventType.LOG_TO_FILE)
    assert et.track(EventType.LOG_TO_FILE, "X", now=1.0)
    assert et.cleanup(stale_after_seconds=10.0, now=100.0) == 1
    assert et.track(EventType.LOG_TO_FILE, "X", now=101.0)


def test_log_deduplicator():
    from birdnet_go_tpu.analysis.eventtracker import LogDeduplicator

    now = [0.0]
    d = LogDeduplicator(health_check_interval=60.0, clock=lambda: now[0])
    assert d.should_log("s1", 5, 2) == (True, "first_log")
    assert d.should_log("s1", 5, 2) == (False, "deduplicated")
    assert d.should_log("s1", 6, 2) == (True, "values_changed")
    now[0] = 61.0
    assert d.should_log("s1", 6, 2) == (True, "health_check")
    assert LogDeduplicator(enabled=False).should_log("x", 1) \
        == (True, "dedup_disabled")


def test_job_queue_runs_and_counts():
    q = JobQueue(capacity=10, workers=2)
    q.start()
    done = []
    for i in range(5):
        q.enqueue(lambda i=i: done.append(i), f"job{i}")
    q.stop(drain=True)
    assert sorted(done) == [0, 1, 2, 3, 4]
    assert q.stats.completed == 5


def test_job_queue_retry_then_success():
    q = JobQueue(capacity=10, workers=1)
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")

    q.start()
    q.enqueue(flaky, "flaky",
              retry=RetryConfig(enabled=True, max_retries=5,
                                initial_delay=0.01, max_delay=0.02))
    import time as _t
    deadline = _t.monotonic() + 5
    while len(attempts) < 3 and _t.monotonic() < deadline:
        _t.sleep(0.02)
    q.stop(drain=True)
    assert len(attempts) == 3
    assert q.stats.completed == 1
    assert q.stats.retried == 2


def test_job_queue_drop_when_full():
    q = JobQueue(capacity=2, workers=1)   # not started: nothing drains
    assert q.enqueue(lambda: None, "a")
    assert q.enqueue(lambda: None, "b")
    assert not q.enqueue(lambda: None, "c")
    assert q.stats.dropped == 1


def test_job_queue_priority_shedding_order():
    """When full, a critical job (clip/database) evicts the newest
    low-priority pending job; low-priority incoming is dropped outright;
    equal-priority incoming never evicts (VERDICT r3 #1; reference drop
    accounting jobqueue/queue.go:59-204)."""
    q = JobQueue(capacity=3, workers=1)   # not started: nothing drains
    assert q.enqueue(lambda: None, "log1", category="log")
    assert q.enqueue(lambda: None, "mqtt1", category="mqtt")
    assert q.enqueue(lambda: None, "clip1", category="clip")
    # full. Incoming clip save evicts the newest low-priority job (mqtt1)
    assert q.enqueue(lambda: None, "clip2", category="clip")
    assert q.stats.by_category["mqtt"]["dropped"] == 1
    assert q.stats.by_category["mqtt"]["shed"] == 1
    assert q.stats.shed == 1
    # incoming low-priority job is dropped, nothing evicted
    assert not q.enqueue(lambda: None, "alert1", category="alert")
    assert q.stats.by_category["alert"]["dropped"] == 1
    # normal-priority incoming evicts remaining low (log1)
    assert q.enqueue(lambda: None, "spect1", category="spectrogram")
    assert q.stats.by_category["log"]["shed"] == 1
    # queue now: clip1, clip2, spect1 — a critical incoming may still
    # evict the normal-priority spectrogram job...
    assert q.enqueue(lambda: None, "clip3", category="clip")
    assert q.stats.by_category["spectrogram"]["shed"] == 1
    # ...but with only critical peers left it cannot evict and is dropped
    assert not q.enqueue(lambda: None, "clip4", category="clip")
    assert q.stats.by_category["clip"]["dropped"] == 1
    assert q.stats.by_category["clip"]["shed"] == 0
    assert q.stats.dropped == 5  # mqtt1, alert1, log1, spect1, clip4
    assert q.stats.shed == 3


def test_job_queue_bands_drain_critical_first():
    """Workers drain the critical band before normal before low, so under
    a burst clip saves and DB writes run ahead of notification fan-out."""
    q = JobQueue(capacity=16, workers=1)
    order = []
    q.enqueue(lambda: order.append("log"), "l", category="log")
    q.enqueue(lambda: order.append("alert"), "a", category="alert")
    q.enqueue(lambda: order.append("spect"), "s", category="spectrogram")
    q.enqueue(lambda: order.append("db"), "d", category="database")
    q.enqueue(lambda: order.append("clip"), "c", category="clip")
    q.start()
    q.stop(drain=True)
    assert order == ["db", "clip", "spect", "log", "alert"]
    assert q.stats.completed == 5
    assert q.stats.by_category["database"]["completed"] == 1


# -- ultrasonic CV filter (processor.go:881-893 applyUltrasonicFilter) -------------

@pytest.mark.parametrize("cv,enabled,kept", [
    (0.05, True, False),   # steady ultrasonic energy → unlikely → discarded
    (0.149, True, False),  # just under the 0.15 default threshold
    (0.151, True, True),   # strong frame-to-frame variation → bat-like
    (0.05, False, True),   # filter disabled → passes
    (None, True, True),    # ordinary (non-raw-rate) window carries no CV
])
def test_ultrasonic_filter_window_gate(cv, enabled, kept):
    p, s, now = make_processor()
    s.ultrasonic_filter.enabled = enabled
    w = pred(0, 0.9)
    w.ultrasonic_cv = cv
    p.submit(w)
    assert bool(p.pending_snapshot()) == kept
    if not kept:
        assert p.stats.discard_reasons.get("ultrasonic filter") == 1


def test_pending_detection_carries_window_pcm():
    import numpy as np

    p, s, now = make_processor()
    w = pred(0, 0.9)
    w.pcm = np.full(16, 7, np.int16)
    w.pcm_rate = 256000
    p.submit(w)
    item = p.pending_snapshot()[0]
    assert item.pcm_rate == 256000
    assert (item.pcm == 7).all()


# -- secondary results (Note.Results parity) ---------------------------------------

def test_best_window_topk_captured_for_persistence():
    """The pending entry must carry the FULL top-K of whichever window
    holds the best confidence (reference: Note.Results children persisted
    by DatabaseAction, datastore/model.go)."""
    approved = []
    p, s, now = make_processor(approved_sink=lambda d, item:
                               approved.append((d, item)))
    # window 1: blackbird 0.7 with tit 0.3 second place
    w1 = WindowPrediction(source_id="src1", model_id=M, start_time=1000.0,
                          end_time=1003.0, indices=[0, 4],
                          confidences=[0.7, 0.3])
    p.submit(w1)
    # window 2 improves the best: blackbird 0.9, owl 0.2 second
    w2 = WindowPrediction(source_id="src1", model_id=M, start_time=1001.5,
                          end_time=1004.5, indices=[0, 1],
                          confidences=[0.9, 0.2])
    p.submit(w2)
    key = "src1:Turdus merula"
    item = p._pending[key]
    assert item.detection.confidence == 0.9
    # top-K reflects window 2 (the best window), including the owl
    assert item.topk[0] == ("Turdus merula", "Eurasian Blackbird", 0.9)
    assert item.topk[1][0] == "Strix aluco"
    # a later weaker window must NOT overwrite the best window's top-K
    w3 = WindowPrediction(source_id="src1", model_id=M, start_time=1003.0,
                          end_time=1006.0, indices=[0, 4],
                          confidences=[0.6, 0.5])
    p.submit(w3)
    assert item.topk[1][0] == "Strix aluco"


def test_results_persisted_and_served():
    """insert_detection(results=...) stores ranked secondary predictions
    retrievable via get_results (GetNoteResults)."""
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    ds = Datastore(":memory:")
    det_id = ds.insert_detection(
        _detection(),
        results=[("Turdus merula", "Eurasian Blackbird", 0.9),
                 ("Strix aluco", "Tawny Owl", 0.2)])
    rows = ds.get_results(det_id)
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[1]["scientific_name"] == "Strix aluco"
    assert rows[1]["confidence"] == pytest.approx(0.2)
    # daily events rollup + latest weather + locked clips round out the
    # datastore interface breadth (SaveDailyEvents/LatestHourlyWeather/
    # GetLockedNotesClipPaths)
    date = rows and ds.get_detection(det_id)["date"]
    ev = ds.save_daily_events(date)
    assert ev["detections"] == 1 and ds.get_daily_events(date) == ev
    assert ds.latest_hourly_weather() is None
    assert ds.locked_clip_names() == []
    ds.optimize()   # VACUUM/ANALYZE must not raise


def test_daily_events_incremental_rollup_matches_recompute():
    """insert_detection maintains daily_events incrementally
    (_bump_daily_events): O(log n) per insert instead of the full-day
    rescan that made bulk ingest quadratic (measured 79% of migration
    CPU). Contract: after any insert sequence — repeated species,
    out-of-order times, multiple days — the incremental rollup equals a
    full recompute, including the distinct-species counter."""
    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    ds = Datastore(":memory:")
    day0 = 1_700_000_000.0 - (1_700_000_000.0 % 86400)
    seq = [("Turdus merula", day0 + 9 * 3600),       # day 1
           ("Strix aluco", day0 + 7 * 3600),         # earlier time, new sp
           ("Turdus merula", day0 + 22 * 3600),      # repeat sp, latest
           ("Parus major", day0 + 12 * 3600),        # third species
           ("Strix aluco", day0 + 86400 + 3600)]     # day 2
    for sci, ts in seq:
        ds.insert_detection(_detection(sci=sci, ts=ts))
    for date in {ds.get_detection(i + 1)["date"] for i in range(len(seq))}:
        inc = ds.get_daily_events(date)
        assert inc == ds.save_daily_events(date), date
    day1 = ds.get_daily_events(ds.get_detection(1)["date"])
    assert day1["detections"] == 4 and day1["species"] == 3
    assert day1["first_detection"] < day1["last_detection"]

    # a rollup row pre-seeded by a recompute over an empty day ('' times)
    # must not win the MIN() against a real first time
    ds.save_daily_events("2031-01-01")
    import datetime
    ts = datetime.datetime(2031, 1, 1, 10, 30).timestamp()
    ds.insert_detection(_detection(ts=ts))
    ev = ds.get_daily_events("2031-01-01")
    assert ev["first_detection"] == "10:30:00" == ev["last_detection"]
    assert ev == ds.save_daily_events("2031-01-01")

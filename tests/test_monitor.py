"""System resource monitor → metric alert rules.

Reference: internal/monitor (pure collector publishing cpu/memory/disk
samples into the alerting engine; thresholds live in user rules), and
internal/monitor/critical_paths.go GroupPathsByMountPoint."""

import os

from birdnet_go_tpu.analysis.alerting import AlertingEngine, AlertRule
from birdnet_go_tpu.config.settings import Settings
from birdnet_go_tpu.utils.monitor import SystemMonitor, dedupe_by_mount


def make_engine():
    clock = {"t": 10_000.0}
    return AlertingEngine(clock=lambda: clock["t"]), clock


# -- threshold rules (alerting side) -----------------------------------------


def test_metric_rule_fires_on_threshold_crossing():
    eng, _ = make_engine()
    eng.add_rule(AlertRule(rule_id="cpu90", name="cpu high", metric="cpu",
                           threshold=90.0, min_interval_seconds=0))
    assert eng.publish_metric("cpu", 50.0) == []
    fired = eng.publish_metric("cpu", 95.0)
    assert len(fired) == 1
    assert "cpu" in fired[0].message and "95" in fired[0].message
    # a metric rule never matches detections
    rule = eng.rules["cpu90"]
    assert not eng.matches(rule, {"confidence": 1.0,
                                  "scientific_name": "x",
                                  "common_name": "x"})


def test_metric_rule_recovery_notice():
    eng, _ = make_engine()
    eng.add_rule(AlertRule(rule_id="mem", name="mem", metric="memory",
                           threshold=80.0, min_interval_seconds=0))
    eng.publish_metric("memory", 85.0)
    rec = eng.publish_metric("memory", 60.0)
    assert len(rec) == 1
    assert "recovered" in rec[0].message
    assert rec[0].detection.get("recovered") is True
    # no second recovery while already below
    assert eng.publish_metric("memory", 55.0) == []


def test_sustained_window_requires_full_coverage():
    eng, clock = make_engine()
    eng.add_rule(AlertRule(rule_id="s", name="sustained", metric="cpu",
                           threshold=90.0, sustained_seconds=120,
                           min_interval_seconds=0))
    # first high sample: window not yet covered by samples → no fire
    assert eng.publish_metric("cpu", 95.0) == []
    clock["t"] += 60
    assert eng.publish_metric("cpu", 96.0) == []
    clock["t"] += 60
    # 120 s of continuous >=90 coverage → fires
    assert len(eng.publish_metric("cpu", 97.0)) == 1
    # a dip resets: below-threshold sample inside the window blocks
    clock["t"] += 60
    eng.publish_metric("cpu", 50.0)          # recovery
    clock["t"] += 60
    assert eng.publish_metric("cpu", 95.0) == []


def test_disk_rules_are_path_qualified():
    eng, _ = make_engine()
    eng.add_rule(AlertRule(rule_id="d", name="disk", metric="disk",
                           threshold=90.0, path="/data",
                           min_interval_seconds=0))
    assert eng.publish_metric("disk", 95.0, path="/media") == []
    assert len(eng.publish_metric("disk", 95.0, path="/data")) == 1
    # unqualified rule matches any mount
    eng.add_rule(AlertRule(rule_id="any", name="anydisk", metric="disk",
                           threshold=90.0, min_interval_seconds=0))
    fired = eng.publish_metric("disk", 99.0, path="/media")
    assert [e.rule_id for e in fired] == ["any"]


def test_metric_message_template_custom():
    eng, _ = make_engine()
    eng.add_rule(AlertRule(rule_id="c", name="c", metric="disk",
                           threshold=50.0, min_interval_seconds=0,
                           message_template="{metric} {value:.1f} on {path}"))
    fired = eng.publish_metric("disk", 77.0, path="/x")
    assert fired[0].message == "disk /x 77.0 on /x"


# -- monitor (collector side) -------------------------------------------------


def test_dedupe_by_mount(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b" / "c"
    a.mkdir()
    b.mkdir(parents=True)
    out = dedupe_by_mount([str(a), str(b), str(tmp_path),
                           str(tmp_path / "missing" / "deep")])
    # same filesystem → one representative (the shortest existing path)
    assert out == [str(tmp_path)]
    assert dedupe_by_mount(["", "/definitely/not/here/xyz/abc"]) in (
        [], ["/"], ["/definitely/not"])  # parent-walk may hit root fs rep


def test_monitor_publishes_samples(tmp_path):
    s = Settings()
    s.data_dir = str(tmp_path)
    s.database.path = str(tmp_path / "db.sqlite")
    events = []

    class Rec:
        def publish_metric(self, metric, value, path=""):
            events.append((metric, value, path))
            return []

    mon = SystemMonitor(Rec(), s)
    paths = mon.critical_paths()
    assert paths, "db/data dirs must yield at least one mount"
    # prime CPU baseline, then burn a little and sample
    mon._cpu_percent()
    for _ in range(50_000):
        os.getpid()
    n = mon.sample_once()
    kinds = {m for m, _, _ in events}
    assert "memory" in kinds and "disk" in kinds
    assert n == len(events)
    for metric, value, path in events:
        assert 0.0 <= value <= 100.0
        if metric == "disk":
            assert path in paths


def test_monitor_respects_disabled_metrics(tmp_path):
    s = Settings()
    s.data_dir = str(tmp_path)
    s.monitoring.cpu = False
    s.monitoring.memory = False
    s.monitoring.disk = False
    events = []

    class Rec:
        def publish_metric(self, *a, **k):
            events.append(a)
            return []

    assert SystemMonitor(Rec(), s).sample_once() == 0
    assert events == []

"""Logging configuration (rotating files, module levels, WARN+ → error
ring) and the periodic pipeline stats logger.

Reference: internal/logger (rotation, module children), main.go:139-150
(slog tee into the health ring), processor/pipeline_stats.go."""

import logging

import pytest

from birdnet_go_tpu.analysis.pipeline_stats import PipelineStatsLogger
from birdnet_go_tpu.config.settings import Settings
from birdnet_go_tpu.utils.health import GLOBAL_ERROR_BUFFER
from birdnet_go_tpu.utils.logsetup import configure_logging


@pytest.fixture()
def clean_root():
    root = logging.getLogger()
    before = list(root.handlers)
    level = root.level
    yield root
    root.handlers = before
    root.setLevel(level)


def test_rotating_file_handler_and_levels(tmp_path, clean_root):
    s = Settings()
    s.log.path = str(tmp_path / "logs" / "birdnet.log")
    s.log.max_size_mb = 0.001              # ~1 KB: force rotation
    s.log.keep = 2
    s.log.module_levels = {"scheduler": "error", "birdnet_tpu.api": "debug"}
    configure_logging(s)
    log = logging.getLogger("birdnet_tpu.test")
    for i in range(200):
        log.info("filler line %04d — with enough text to exceed the cap", i)
    for h in logging.getLogger().handlers:
        h.flush()
    logdir = tmp_path / "logs"
    files = sorted(p.name for p in logdir.iterdir())
    assert "birdnet.log" in files
    assert any(".log.1" in f for f in files), files   # rotated generation
    assert len(files) <= 3                             # keep=2 + active
    # module level overrides
    assert logging.getLogger("birdnet_tpu.scheduler").level == logging.ERROR
    assert logging.getLogger("birdnet_tpu.api").level == logging.DEBUG


def test_reconfigure_replaces_owned_handlers(clean_root):
    configure_logging(Settings())
    n1 = len(logging.getLogger().handlers)
    configure_logging(Settings())          # reload: no handler stacking
    assert len(logging.getLogger().handlers) == n1


def test_warnings_reach_error_ring(clean_root):
    configure_logging(Settings())
    marker = "ring-tee-check-xyzzy"
    logging.getLogger("birdnet_tpu.somewhere").warning(marker)
    assert any(marker in e["message"]
               for e in GLOBAL_ERROR_BUFFER.recent(50))


def test_tagged_failure_lands_once_in_ring_with_traceback(clean_root):
    """ErrorBuilder.build() is the single log emission for an incident —
    one ring entry carrying taxonomy AND the traceback via exc_info, so
    call sites must not add a second log.exception (which used to halve
    the 256-slot ring with duplicates)."""
    configure_logging(Settings())
    from birdnet_go_tpu.utils import errors as errors_mod

    marker = "single-emit-qwerty"
    before = len(GLOBAL_ERROR_BUFFER.recent(256))
    try:
        raise ValueError(marker)
    except ValueError as e:
        errors_mod.new(e).component("audio-capture") \
            .category(errors_mod.Category.AUDIO) \
            .context("source_id", "s1").build()
    entries = [x for x in GLOBAL_ERROR_BUFFER.recent(256)
               if marker in x["message"]]
    assert len(entries) == 1
    assert len(GLOBAL_ERROR_BUFFER.recent(256)) == before + 1
    assert entries[0]["component"] == "audio-capture"
    assert entries[0]["category"] == "audio"
    assert entries[0]["context"]["source_id"] == "s1"


def test_app_setup_attaches_error_ring(clean_root, tmp_path):
    """Embedded apps (no CLI logging setup) still get /system/errors data:
    Application.setup attaches the ring handler itself."""
    root = logging.getLogger()
    root.handlers = [h for h in root.handlers
                     if h is not GLOBAL_ERROR_BUFFER]
    from birdnet_go_tpu.app import Application
    from birdnet_go_tpu.config.settings import Settings

    s = Settings()
    s.models = []                          # no classifiers needed
    s.database.path = str(tmp_path / "t.db")
    s.webserver.enabled = False
    s.export.enabled = False
    app = Application(s)
    app.setup()
    try:
        assert GLOBAL_ERROR_BUFFER in root.handlers
    finally:
        app.stop()


class _Stats:
    def __init__(self):
        self.windows_processed = 0
        self.overruns = 0
        self.windows_deferred = 0
        self.last_batch_fill = 0.5
        self.last_latency_ms = 12.0


class _B:
    def __init__(self):
        self.stats = _Stats()


class _Loop:
    def __init__(self):
        self.batchers = {"M1": _B()}
        self.windows_dropped = 0


def test_pipeline_stats_lines_and_idle_suppression(caplog):
    loop = _Loop()
    psl = PipelineStatsLogger(loop, interval_seconds=10.0)
    assert psl.tick() is None              # idle: nothing processed yet
    loop.batchers["M1"].stats.windows_processed = 500
    with caplog.at_level(logging.INFO, logger="birdnet_tpu.pipeline"):
        line = psl.tick()
    assert line is not None
    assert "M1: 50.0 win/s" in line and "fill=50%" in line
    assert psl.tick() is None              # no new work since: idle again
    loop.batchers["M1"].stats.overruns = 2
    loop.batchers["M1"].stats.windows_processed = 600
    loop.windows_dropped = 7
    line = psl.tick()
    assert "overruns+2" in line and "dropped+7" in line


def test_pipeline_stats_steady_state_deduplicated():
    """Identical healthy throughput logs once, suppresses repeats, and
    re-logs on a rate-bucket change (log_deduplicator.go semantics —
    LogDeduplicator now drives the stats line)."""
    fake_now = [1000.0]
    loop = _Loop()
    psl = PipelineStatsLogger(loop, interval_seconds=10.0)
    psl.dedup.clock = lambda: fake_now[0]
    w = 0
    lines = []
    for _ in range(5):                       # perfectly steady 50 win/s
        w += 500
        loop.batchers["M1"].stats.windows_processed = w
        fake_now[0] += 10
        lines.append(psl.tick())
    assert lines[0] is not None
    assert all(ln is None for ln in lines[1:])    # suppressed
    w += 2000                                 # rate jumps a bucket
    loop.batchers["M1"].stats.windows_processed = w
    fake_now[0] += 10
    assert psl.tick() is not None              # values_changed re-logs
    # and the 10-min health re-log fires even when nothing changed
    for _ in range(2):
        w += 2000
        loop.batchers["M1"].stats.windows_processed = w
        fake_now[0] += 10
        psl.tick()
    fake_now[0] += 601
    w += 2000
    loop.batchers["M1"].stats.windows_processed = w
    assert psl.tick() is not None


def test_pipeline_stats_unhealthy_intervals_always_log():
    """A constant overrun rate (identical unhealthy deltas every interval)
    must keep logging — the dedup only suppresses healthy steady state —
    and the first healthy interval after the incident logs the recovery."""
    fake_now = [1000.0]
    loop = _Loop()
    psl = PipelineStatsLogger(loop, interval_seconds=10.0)
    psl.dedup.clock = lambda: fake_now[0]
    w, o = 0, 0
    lines = []
    for _ in range(4):                  # saturated: +3 overruns / interval
        w += 500
        o += 3
        loop.batchers["M1"].stats.windows_processed = w
        loop.batchers["M1"].stats.overruns = o
        fake_now[0] += 10
        lines.append(psl.tick())
    assert all(ln is not None and "overruns+3" in ln for ln in lines)
    # incident ends: same healthy rate as during it → still logs once
    w += 500
    loop.batchers["M1"].stats.windows_processed = w
    fake_now[0] += 10
    recovery = psl.tick()
    assert recovery is not None and "overruns" not in recovery
    w += 500
    loop.batchers["M1"].stats.windows_processed = w
    fake_now[0] += 10
    assert psl.tick() is None           # back to steady-state suppression


def test_pipeline_stats_pending_backlog_breaks_dedup():
    """A growing processor consensus backlog changes the dedup key even at
    perfectly steady throughput, so operators see pending= lines."""

    class _Proc:
        def __init__(self):
            self._pending = {}

    fake_now = [1000.0]
    loop = _Loop()
    proc = _Proc()
    psl = PipelineStatsLogger(loop, processor=proc, interval_seconds=10.0)
    psl.dedup.clock = lambda: fake_now[0]
    w = 0
    lines = []
    for pend in (5, 5, 50, 400):
        w += 500
        loop.batchers["M1"].stats.windows_processed = w
        proc._pending = {i: None for i in range(pend)}
        fake_now[0] += 10
        lines.append(psl.tick())
    assert lines[0] is not None and "pending=5" in lines[0]
    assert lines[1] is None                        # same bucket: suppressed
    assert lines[2] is not None and "pending=50" in lines[2]
    assert lines[3] is not None and "pending=400" in lines[3]


def test_pipeline_stats_thread_runs():
    import time

    loop = _Loop()
    psl = PipelineStatsLogger(loop, interval_seconds=0.05)
    loop.batchers["M1"].stats.windows_processed = 10
    psl.start()
    try:
        deadline = time.time() + 3
        while psl.lines_emitted == 0 and time.time() < deadline:
            time.sleep(0.02)
        assert psl.lines_emitted >= 1
    finally:
        psl.stop()


def test_predict_spans_recorded_and_summarized():
    from birdnet_go_tpu.utils.tracing import SpanRecorder, predict_span

    rec = SpanRecorder(capacity=4)
    for i in range(6):                     # ring keeps the newest 4
        with predict_span("M1", batch=8, fill=0.75, recorder=rec):
            pass
    with pytest.raises(ValueError):
        with predict_span("M1", batch=8, recorder=rec):
            raise ValueError("boom")       # span records failure, re-raises
    assert rec.total == 7
    s = rec.summary()
    assert s["count"] == 4 and s["errors"] == 1
    assert s["p50_ms"] >= 0 and s["by_model"] == {"M1": 4}
    last = rec.recent(1)[0]
    assert last["ok"] is False and "boom" in last["error"]


def test_batcher_harvest_emits_span():
    import numpy as np

    from birdnet_go_tpu.scheduler.loop import ModelBatcher
    from birdnet_go_tpu.utils.tracing import GLOBAL_SPANS
    from tests.test_realtime_core import _TinyClassifier

    before = GLOBAL_SPANS.total
    b = ModelBatcher(_TinyClassifier(), max_batch=2, top_k=2)
    b.offer(np.zeros(144000, np.int16), "s1", 0.0)
    b.dispatch()
    b.harvest()
    assert GLOBAL_SPANS.total == before + 1
    span = GLOBAL_SPANS.recent(1)[0]
    assert span["batch"] == 1 and span["ok"] and span["fill"] == 0.5

"""Bounded accelerator probe + CPU degradation (utils/backendprobe.py).

Reference behavior mirrored: a missing/broken optional runtime degrades
with a logged fallback instead of taking the service down
(/root/reference/internal/inference runtime fallback chain)."""

import subprocess
import sys

from birdnet_go_tpu.utils import backendprobe


class _R:
    def __init__(self, code=0, out="", err=""):
        self.returncode = code
        self.stdout = out
        self.stderr = err


def test_probe_healthy_backend_no_degrade(monkeypatch):
    calls = []
    monkeypatch.setattr(backendprobe, "_degrade",
                        lambda reason: calls.append(reason))
    monkeypatch.setattr(
        backendprobe.subprocess, "run",
        lambda *a, **k: _R(0, "WARNING: noise\nPLATFORM=tpu\n"))
    assert backendprobe.probe_backend(5.0) == "tpu"
    assert calls == []


def test_probe_timeout_degrades_to_cpu(monkeypatch):
    calls = []
    monkeypatch.setattr(backendprobe, "_degrade",
                        lambda reason: calls.append(reason))

    def _timeout(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=5.0)

    monkeypatch.setattr(backendprobe.subprocess, "run", _timeout)
    assert backendprobe.probe_backend(5.0) == "cpu"
    assert len(calls) == 1 and "exceeded" in calls[0]


def test_probe_backend_error_degrades_to_cpu(monkeypatch):
    calls = []
    monkeypatch.setattr(backendprobe, "_degrade",
                        lambda reason: calls.append(reason))
    monkeypatch.setattr(
        backendprobe.subprocess, "run",
        lambda *a, **k: _R(1, "", "RuntimeError: Unable to initialize "
                                  "backend 'axon': UNAVAILABLE"))
    assert backendprobe.probe_backend(5.0) == "cpu"
    assert len(calls) == 1 and "UNAVAILABLE" in calls[0]


def test_degrade_tags_error_and_pins_cpu():
    """_degrade itself: jax pinned to cpu + tagged error in the ring."""
    import logging

    import jax

    from birdnet_go_tpu.config.settings import Settings
    from birdnet_go_tpu.utils.health import GLOBAL_ERROR_BUFFER
    from birdnet_go_tpu.utils.logsetup import configure_logging

    root = logging.getLogger()
    before = list(root.handlers)
    try:
        configure_logging(Settings())
        backendprobe._degrade("unit-test transport down")
    finally:
        root.handlers = before
    assert jax.config.jax_platforms == "cpu"
    entries = [e for e in GLOBAL_ERROR_BUFFER.recent(64)
               if "serving on CPU" in e["message"]]
    assert entries and entries[0]["component"] == "inference"


def test_probe_subprocess_real_cpu():
    """End-to-end child run: the real probe code prints PLATFORM= on a
    CPU-pinned interpreter (proves _PROBE_CODE is valid)."""
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu')\n"
         + backendprobe._PROBE_CODE],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0
    assert "PLATFORM=cpu" in r.stdout


def test_serve_parser_accepts_probe_flags():
    from birdnet_go_tpu.cli.main import build_parser

    args = build_parser().parse_args(
        ["serve", "--no-backend-probe", "--backend-probe-timeout", "7"])
    assert args.no_backend_probe is True
    assert args.backend_probe_timeout == 7.0

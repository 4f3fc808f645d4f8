"""Per-species ExecuteCommand actions (reference: getActionsForItem +
ExecuteCommandAction, processor.go:1881-1995 / execute.go): custom
actions replace the default chain unless execute_defaults is set; a
broken command with execute_defaults=false must not silently restore
the defaults; arguments are sorted --Key=value with Confidence 0-100."""

from __future__ import annotations

import time

import pytest

from tests.test_app_integration import tiny_app  # noqa: F401 (fixture)
from tests.test_realtime_core import _detection


def _script(tmp_path, name="hook.sh"):
    out = tmp_path / "argv.txt"
    sh = tmp_path / name
    sh.write_text(f"#!/bin/sh\necho \"$@\" > {out}\n")
    sh.chmod(0o755)
    return sh, out


def test_execute_command_action_args(tmp_path):
    from birdnet_go_tpu.analysis.actions import ExecuteCommandAction

    sh, out = _script(tmp_path)
    act = ExecuteCommandAction(
        command=str(sh),
        params={"CommonName": "Great Tit", "Confidence": 93.0,
                "ScientificName": "Parus major"})
    act.execute()
    argv = out.read_text().strip()
    # sorted keys, --Key=value form, confidence already 0-100
    assert argv == ("--CommonName=Great Tit --Confidence=93"
                    " --ScientificName=Parus major")


def test_execute_command_validation_and_failure(tmp_path):
    from birdnet_go_tpu.analysis.actions import ExecuteCommandAction

    missing = ExecuteCommandAction(command=str(tmp_path / "nope.sh"),
                                   params={})
    assert "not found" in (missing.validate() or "")
    with pytest.raises(RuntimeError, match="not found"):
        missing.execute()

    bad = tmp_path / "fail.sh"
    bad.write_text("#!/bin/sh\nexit 3\n")
    bad.chmod(0o755)
    with pytest.raises(RuntimeError, match="exited 3"):
        ExecuteCommandAction(command=str(bad), params={}).execute()

    with pytest.raises(ValueError, match="invalid parameter"):
        ExecuteCommandAction(command=str(bad),
                             params={"bad name": 1}).build_args()


def _approve(app, d):
    from birdnet_go_tpu.analysis.processor import PendingDetection

    item = PendingDetection(detection=d, source_id=d.source_id,
                            first_detected=time.time(),
                            flush_deadline=time.time(), count=3)
    app._on_approved(d, item)
    deadline = time.time() + 10
    while app.jobqueue.pending() and time.time() < deadline:
        time.sleep(0.05)
    time.sleep(0.2)          # let in-flight jobs finish


def test_custom_action_replaces_defaults(tiny_app, tmp_path):  # noqa: F811
    app = tiny_app
    app.start(warmup=False)
    sh, out = _script(tmp_path)
    d = _detection(sci="Regulus regulus", common="Goldcrest")
    d.model_id = "BirdNET_V2.4"
    app.settings.species.config = {
        "Regulus regulus": {"actions": [{
            "type": "ExecuteCommand", "command": str(sh),
            "parameters": ["CommonName", "Confidence"],
        }]}}
    before = app.datastore.count_detections()
    _approve(app, d)
    assert out.exists()
    assert "--CommonName=Goldcrest" in out.read_text()
    assert "--Confidence=90" in out.read_text()
    # execute_defaults absent → defaults suppressed: no DB row
    assert app.datastore.count_detections() == before


def test_custom_action_with_defaults(tiny_app, tmp_path):  # noqa: F811
    app = tiny_app
    app.start(warmup=False)
    sh, out = _script(tmp_path)
    d = _detection(sci="Regulus regulus", common="Goldcrest")
    d.model_id = "BirdNET_V2.4"
    app.settings.species.config = {
        "Regulus regulus": {"actions": [{
            "type": "ExecuteCommand", "command": str(sh),
            "parameters": ["ScientificName"],
            "execute_defaults": True,
        }]}}
    before = app.datastore.count_detections()
    _approve(app, d)
    assert out.exists()
    assert app.datastore.count_detections() == before + 1


def test_broken_command_honors_defaults_opt_out(tiny_app, tmp_path):  # noqa: F811
    app = tiny_app
    app.start(warmup=False)
    d = _detection(sci="Regulus regulus", common="Goldcrest")
    d.model_id = "BirdNET_V2.4"
    app.settings.species.config = {
        "Regulus regulus": {"actions": [{
            "type": "ExecuteCommand",
            "command": str(tmp_path / "gone.sh"),
        }]}}
    before = app.datastore.count_detections()
    _approve(app, d)
    # broken script + execute_defaults=false → NOTHING runs
    assert app.datastore.count_detections() == before


def test_unimplemented_action_type_falls_through(tiny_app):  # noqa: F811
    app = tiny_app
    app.start(warmup=False)
    d = _detection(sci="Regulus regulus", common="Goldcrest")
    d.model_id = "BirdNET_V2.4"
    app.settings.species.config = {
        "Regulus regulus": {"actions": [{"type": "SendNotification"}]}}
    before = app.datastore.count_detections()
    _approve(app, d)
    # unimplemented types must not suppress the default chain
    assert app.datastore.count_detections() == before + 1

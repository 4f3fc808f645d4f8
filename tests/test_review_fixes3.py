"""Regression tests for the round-2 self-review findings (batch 3):
MySQL schema translation of TEXT defaults, OIDC/SSO CSRF delivery,
RTSP mid-body connection close, pipeline-stats pending count, service
worker shell completeness, species-dictionary content negotiation."""

from __future__ import annotations

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def test_mysql_translation_strips_all_text_defaults():
    """MySQL rejects any DEFAULT on TEXT columns (error 1101); the
    notifications table uses DEFAULT '{}' which the old translation
    (exact-match on DEFAULT '') left in place."""
    from birdnet_go_tpu.datastore.mysql import translate_sql
    from birdnet_go_tpu.datastore.sqlite import _SCHEMA

    out = translate_sql(_SCHEMA)
    assert "TEXT NOT NULL DEFAULT" not in out
    # sanity: the notifications table is still created
    assert "CREATE TABLE IF NOT EXISTS notifications" in out


def test_auth_status_returns_csrf_for_session():
    """OIDC/SSO logins arrive via redirect and never pass through the
    password login page that seeds sessionStorage; /auth/status is the
    only way the SPA can learn the session's CSRF token (the cookie is
    httponly)."""
    import asyncio

    from birdnet_go_tpu.api.security import (
        SESSION_COOKIE,
        AuthHandlers,
        SecurityManager,
    )
    from birdnet_go_tpu.config.settings import Settings

    s = Settings()
    s.webserver.password = "pw"
    sec = SecurityManager(s)
    assert sec.enabled
    sid, csrf = sec.create_session()

    class _Req:
        cookies = {SESSION_COOKIE: sid}
        headers: dict = {}

    class _H:
        security = sec

    # call the handler directly (it only reads .security and the request)
    resp = asyncio.new_event_loop().run_until_complete(
        AuthHandlers.h_auth_status(_H(), _Req()))
    import json

    body = json.loads(resp.body)
    assert body["authenticated"] is True
    assert body["csrf"] == csrf


def test_rtsp_read_response_raises_on_midbody_close():
    """A camera closing the TCP connection before Content-Length bytes
    arrive must raise (recv returns b'' forever on a closed socket; the
    old loop spun at 100% CPU)."""
    import pytest

    from birdnet_go_tpu.audio.rtsp import RtspSource

    class _Sock:
        def __init__(self):
            self.chunks = [
                b"RTSP/1.0 200 OK\r\nCSeq: 1\r\nContent-Length: 100\r\n"
                b"\r\npartial",
            ]

        def recv(self, n):
            return self.chunks.pop(0) if self.chunks else b""

    src = RtspSource.__new__(RtspSource)
    with pytest.raises(ConnectionError, match="mid-body"):
        src._read_response(_Sock())


def test_pipeline_stats_reads_real_pending_map():
    """The stats line reads the processor's actual pending map
    (`_pending`), not a nonexistent `pending` attribute."""
    from birdnet_go_tpu.analysis.pipeline_stats import PipelineStatsLogger

    class _Proc:
        _pending = {"src:Parus major": object(), "src:Turdus merula": object()}

    class _Stats:
        windows_processed = 10
        overruns = 0
        windows_deferred = 0
        last_batch_fill = 1.0
        last_latency_ms = 5.0

    class _Batcher:
        stats = _Stats()

    class _Loop:
        windows_dropped = 0
        batchers = {"m": _Batcher()}

    logger = PipelineStatsLogger(device_loop=_Loop(), processor=_Proc())
    line = logger.tick()
    assert line is not None and "pending=2" in line


def test_service_worker_shell_covers_every_view_module():
    """Every module under static/views/ must be precached: precached
    modules statically import their siblings, so one missing file breaks
    the offline module graph."""
    sw = (ROOT / "birdnet_go_tpu/api/static/sw.js").read_text()
    shell = set(re.findall(r'"(/static/views/[^"]+)"', sw))
    views = {f"/static/views/{p.name}"
             for p in (ROOT / "birdnet_go_tpu/api/static/views").glob("*.js")}
    assert shell == views


def test_species_cfg_cache_invalidates_on_new_config():
    """_base_threshold caches the lowercased species config per config
    object; swapping in a fresh dict (RELOAD_SPECIES_CONFIG) must be
    picked up."""
    from birdnet_go_tpu.analysis.processor import Processor
    from birdnet_go_tpu.analysis.results import Species
    from birdnet_go_tpu.config.settings import Settings

    s = Settings()
    s.species.config = {"Parus Major": {"threshold": 0.31}}
    p = Processor(settings=s, labels_by_model={})
    sp = Species(scientific="Parus major", common="Great Tit")
    assert p._base_threshold("m", sp) == (0.31, True)
    # same object mutated in place but same length: cache may serve the
    # old copy; a *new* dict must always invalidate
    s.species.config = {"Parus Major": {"threshold": 0.77}}
    assert p._base_threshold("m", sp) == (0.77, True)

"""TLS: self-signed generation, SAN collection, key-pair validation, the
certificate store, the /api/v2/tls endpoints, and HTTPS serving.

Reference behavior: internal/tls/{generate,sans}.go and
internal/api/v2/tls/tls.go."""

import datetime
import json
import ssl
import urllib.error
import urllib.request

import pytest

from birdnet_go_tpu.utils.tlscert import (
    TLSManager,
    collect_sans,
    generate_self_signed,
    is_valid_hostname,
    parse_certificate_info,
    parse_validity,
    validate_key_pair,
)
from tests.test_api_ext import _req, served, tiny_app  # noqa: F401


def test_generate_self_signed_roundtrip():
    cert, key = generate_self_signed(sans=["localhost", "127.0.0.1",
                                           "bird.example.org"])
    assert cert.startswith("-----BEGIN CERTIFICATE-----")
    assert "PRIVATE KEY" in key
    info = parse_certificate_info(cert)
    assert info["installed"]
    assert set(info["sans"]) == {"localhost", "127.0.0.1",
                                 "bird.example.org"}
    assert info["daysUntilExpiry"] > 1800          # 5-year default
    assert len(info["fingerprint"]) == 64          # SHA-256 hex
    validate_key_pair(cert, key)                   # no raise


def test_key_pair_mismatch_rejected():
    cert, _ = generate_self_signed()
    _, other_key = generate_self_signed()
    with pytest.raises(ValueError):
        validate_key_pair(cert, other_key)


def test_validity_parsing_bounds():
    assert parse_validity(None).days == 1825
    assert parse_validity("8760h") == datetime.timedelta(hours=8760)
    assert parse_validity("365d") == datetime.timedelta(days=365)
    for bad in ("1h", "90000h", "eternal", "-5d"):
        with pytest.raises(ValueError):
            parse_validity(bad)


def test_collect_sans_and_hostname_validation():
    sans = collect_sans(host="birdhost", base_url="https://birds.example.com:8443/ui")
    assert sans[0] == "birdhost"
    assert "birds.example.com" in sans
    assert "localhost" in sans and "127.0.0.1" in sans
    assert len(sans) == len(set(sans))             # deduplicated
    # the wildcard bind address is not a SAN
    assert "0.0.0.0" not in collect_sans(host="0.0.0.0")
    assert is_valid_hostname("a-b.example.org")
    assert is_valid_hostname("192.168.1.7")
    assert not is_valid_hostname("-bad.example")
    assert not is_valid_hostname("ex ample.com")
    assert not is_valid_hostname("x" * 300)


def test_manager_store_backup_and_expiry_regen(tmp_path):
    mgr = TLSManager(tmp_path)
    assert not mgr.exists()
    assert mgr.info() == {"installed": False}
    mgr.ensure_self_signed(host="h1")
    assert mgr.exists()
    first = mgr.cert_path().read_text()
    mgr.ensure_self_signed(host="h1")              # still valid: unchanged
    assert mgr.cert_path().read_text() == first
    # an expired certificate is regenerated at startup
    short_cert, short_key = generate_self_signed(
        validity=datetime.timedelta(seconds=1))
    mgr.save(short_cert, short_key)
    import time

    time.sleep(1.1)
    mgr.ensure_self_signed(host="h1")
    assert mgr.cert_path().read_text() != short_cert
    # the overwrite kept a backup generation
    assert mgr.cert_path().with_suffix(".pem.bak").exists()
    assert mgr.delete()
    assert not mgr.exists()
    assert not mgr.delete()                        # second delete: nothing


def test_tls_api_endpoints(served, tmp_path):  # noqa: F811
    app, port = served
    app.settings.webserver.tls_dir = str(tmp_path / "tls")
    out = _req(port, "/tls/certificate")
    assert out == {"installed": False}
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/tls/certificate/download")
    assert e.value.code == 404
    # generate (validity validated like tls.go)
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/tls/certificate/generate", "POST", {"validity": "1h"})
    assert e.value.code == 400
    out = _req(port, "/tls/certificate/generate", "POST",
               {"validity": "720h"})
    assert out["installed"] and out["restartRequired"]
    assert 28 <= out["daysUntilExpiry"] <= 30
    info = _req(port, "/tls/certificate")
    assert info["installed"] and info["sans"]
    # download returns the PEM (not the key)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2/tls/certificate/download")
    with urllib.request.urlopen(req, timeout=10) as r:
        pem = r.read().decode()
    assert "BEGIN CERTIFICATE" in pem and "PRIVATE KEY" not in pem
    # upload: a mismatched pair is rejected, a valid one accepted
    cert, key = generate_self_signed()
    cert2, _ = generate_self_signed()
    with pytest.raises(urllib.error.HTTPError) as e:
        _req(port, "/tls/certificate", "POST",
             {"certificate": cert2, "privateKey": key})
    assert e.value.code == 400
    out = _req(port, "/tls/certificate", "POST",
               {"certificate": cert, "privateKey": key})
    assert out["installed"]
    # a restart-required notification landed in the inbox
    titles = [n["title"] for n in app.notification_inbox.list(50, False)]
    assert "Restart required" in titles
    assert _req(port, "/tls/certificate", "DELETE")["deleted"]
    assert _req(port, "/tls/certificate") == {"installed": False}


def test_https_serving(tmp_path):
    """tls_enabled=True serves real HTTPS with the auto-generated cert."""
    from birdnet_go_tpu.api.server import ApiServer

    class _Ctx:
        pass

    from birdnet_go_tpu.config.settings import Settings

    ctx = _Ctx()
    ctx.settings = Settings()
    ctx.settings.webserver.tls_enabled = True
    ctx.settings.webserver.tls_dir = str(tmp_path / "tls")
    ctx.settings.webserver.auth_token = None
    ctx.settings.webserver.password = None

    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    srv = ApiServer.__new__(ApiServer)
    # minimal duck-typed context: only health/static surface is probed
    import threading
    import time

    srv.ctx = ctx
    srv.host = "127.0.0.1"
    srv.port = port
    from birdnet_go_tpu.api.sse import SseBroadcaster

    srv.sse = SseBroadcaster()
    srv._thread = None
    srv._loop = None
    srv._started = threading.Event()
    srv._runner = None
    srv.started_at = time.time()
    srv.start()
    try:
        sslctx = ssl.create_default_context()
        sslctx.check_hostname = False
        sslctx.verify_mode = ssl.CERT_NONE          # self-signed
        req = urllib.request.Request(
            f"https://127.0.0.1:{port}/api/v2/settings")
        with urllib.request.urlopen(req, timeout=10, context=sslctx) as r:
            body = json.loads(r.read())
        assert body["webserver"]["tls_enabled"] is True
        # plaintext HTTP against the TLS port must fail
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/v2/settings", timeout=5)
    finally:
        srv.stop()

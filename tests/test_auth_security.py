"""Auth flows: basic-auth login + sessions + CSRF, OAuth2 grants, token
persistence, gzip + secure headers (api/security.py; reference
internal/security, ARCHITECTURE.md:1896-2180)."""

import gzip
import json
import urllib.error
import urllib.request

import pytest

from tests.test_app_integration import tiny_app  # fixture


@pytest.fixture()
def secured(tiny_app, tmp_path):
    app = tiny_app
    ws = app.settings.webserver
    ws.password = "hunter2"
    ws.oauth_client_secret = "s3cret"
    ws.allow_local_bypass = False       # force auth even from localhost
    ws.token_file = str(tmp_path / "tokens.json")
    app.start(warmup=False)
    yield app, ws.port
    app.stop()


class _Resp:
    def __init__(self, status, headers, body):
        self.status = status
        self.headers = headers
        self.body = body

    def json(self):
        return json.loads(self.body)


def _req(port, path, method="GET", body=None, headers=None, form=None):
    data = None
    hdrs = dict(headers or {})
    if form is not None:
        from urllib.parse import urlencode

        data = urlencode(form).encode()
        hdrs["Content-Type"] = "application/x-www-form-urlencoded"
    elif body is not None:
        data = json.dumps(body).encode()
        hdrs["Content-Type"] = "application/json"
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=data, headers=hdrs, method=method)
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return _Resp(r.status, dict(r.headers), r.read())
    except urllib.error.HTTPError as e:
        return _Resp(e.code, dict(e.headers), e.read())


def test_unauthenticated_access_matrix(secured):
    """Every protected route class rejects anonymous access; public probes
    stay reachable (binary authz model)."""
    app, port = secured
    protected = [
        ("GET", "/api/v2/detections"),
        ("GET", "/api/v2/settings"),
        ("POST", "/api/v2/system/restart"),
        ("GET", "/api/v2/notifications"),
        ("DELETE", "/api/v2/detections/1"),
        ("GET", "/api/v2/media/audio/x.wav"),
        ("PATCH", "/api/v2/settings/mqtt"),
    ]
    for method, path in protected:
        r = _req(port, path, method)
        assert r.status == 401, f"{method} {path} → {r.status}"
    for path in ("/api/v2/health", "/api/v2/ping", "/login", "/"):
        assert _req(port, path).status == 200, path


def test_login_session_and_csrf(secured):
    app, port = secured
    bad = _req(port, "/api/v2/auth/login", "POST", {"password": "wrong"})
    assert bad.status == 401
    ok = _req(port, "/api/v2/auth/login", "POST", {"password": "hunter2"})
    assert ok.status == 200
    csrf = ok.json()["csrf"]
    cookie = ok.headers["Set-Cookie"].split(";")[0]
    # session cookie grants reads
    r = _req(port, "/api/v2/detections", headers={"Cookie": cookie})
    assert r.status == 200
    # mutating request WITHOUT the CSRF token → 403
    r = _req(port, "/api/v2/settings/mqtt", "PATCH", {"enabled": False},
             headers={"Cookie": cookie})
    assert r.status == 403
    # with CSRF token → accepted
    r = _req(port, "/api/v2/settings/mqtt", "PATCH", {"enabled": False},
             headers={"Cookie": cookie, "X-CSRF-Token": csrf})
    assert r.status == 200
    # logout invalidates the session
    r = _req(port, "/api/v2/auth/logout", "POST", {},
             headers={"Cookie": cookie, "X-CSRF-Token": csrf})
    assert r.status == 200
    r = _req(port, "/api/v2/detections", headers={"Cookie": cookie})
    assert r.status == 401


def test_basic_auth_header(secured):
    import base64

    app, port = secured
    cred = base64.b64encode(b"any:hunter2").decode()
    r = _req(port, "/api/v2/detections",
             headers={"Authorization": f"Basic {cred}"})
    assert r.status == 200
    cred = base64.b64encode(b"any:nope").decode()
    r = _req(port, "/api/v2/detections",
             headers={"Authorization": f"Basic {cred}"})
    assert r.status == 401


def test_oauth2_client_credentials_and_code_flow(secured):
    app, port = secured
    # client credentials grant (form-encoded, standard OAuth2)
    r = _req(port, "/api/v2/oauth2/token", "POST", form={
        "grant_type": "client_credentials",
        "client_id": "birdnet-client", "client_secret": "s3cret"})
    assert r.status == 200
    token = r.json()["access_token"]
    auth = {"Authorization": f"Bearer {token}"}
    assert _req(port, "/api/v2/detections", headers=auth).status == 200
    # bearer-token mutations are CSRF-exempt
    assert _req(port, "/api/v2/settings/mqtt", "PATCH",
                {"enabled": False}, headers=auth).status == 200
    # wrong secret refused
    r = _req(port, "/api/v2/oauth2/token", "POST", form={
        "grant_type": "client_credentials",
        "client_id": "birdnet-client", "client_secret": "bad"})
    assert r.status == 401

    # authorization-code grant: authorize (authenticated) → code → token
    r = _req(port,
             "/api/v2/oauth2/authorize?client_id=birdnet-client",
             headers=auth)
    assert r.status == 200
    code = r.json()["code"]
    r = _req(port, "/api/v2/oauth2/token", "POST", form={
        "grant_type": "authorization_code", "code": code,
        "client_id": "birdnet-client"})
    assert r.status == 200
    token2 = r.json()["access_token"]
    assert _req(port, "/api/v2/detections",
                headers={"Authorization": f"Bearer {token2}"}).status == 200
    # codes are single-use
    r = _req(port, "/api/v2/oauth2/token", "POST", form={
        "grant_type": "authorization_code", "code": code,
        "client_id": "birdnet-client"})
    assert r.status == 401


def test_token_persistence_and_revocation(secured, tmp_path):
    from birdnet_go_tpu.api.security import SecurityManager

    app, port = secured
    ok = _req(port, "/api/v2/auth/login", "POST", {"password": "hunter2"})
    cookie = ok.headers["Set-Cookie"].split(";")[0]
    csrf = ok.json()["csrf"]
    r = _req(port, "/api/v2/auth/tokens", "POST", {"name": "ci"},
             headers={"Cookie": cookie, "X-CSRF-Token": csrf})
    token = r.json()["token"]
    # a NEW manager instance (fresh process analogue) accepts the token
    mgr = SecurityManager(app.settings)
    assert mgr.check_token(token)
    # plaintext never persisted
    raw = (tmp_path / "tokens.json").read_text()
    assert token not in raw
    # revoke
    r = _req(port, "/api/v2/auth/tokens", "DELETE", {"token": token},
             headers={"Cookie": cookie, "X-CSRF-Token": csrf})
    assert r.status == 200
    assert not SecurityManager(app.settings).check_token(token)


def test_gzip_and_secure_headers(secured):
    app, port = secured
    ok = _req(port, "/api/v2/auth/login", "POST", {"password": "hunter2"})
    cookie = ok.headers["Set-Cookie"].split(";")[0]
    r = _req(port, "/api/v2/settings",
             headers={"Cookie": cookie, "Accept-Encoding": "gzip"})
    assert r.headers.get("Content-Encoding") == "gzip"
    body = json.loads(gzip.decompress(r.body))
    assert "webserver" in body
    assert r.headers.get("X-Content-Type-Options") == "nosniff"
    assert r.headers.get("X-Frame-Options") == "SAMEORIGIN"
    # small responses stay uncompressed
    r = _req(port, "/api/v2/ping", headers={"Accept-Encoding": "gzip"})
    assert r.headers.get("Content-Encoding") is None


def test_settings_response_scrubs_secrets(secured):
    app, port = secured
    ok = _req(port, "/api/v2/auth/login", "POST", {"password": "hunter2"})
    cookie = ok.headers["Set-Cookie"].split(";")[0]
    r = _req(port, "/api/v2/settings", headers={"Cookie": cookie})
    body = r.json()
    assert body["webserver"]["password"] == "***"
    assert body["webserver"]["oauth_client_secret"] == "***"
    assert "hunter2" not in r.body.decode()

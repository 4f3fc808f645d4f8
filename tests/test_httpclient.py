"""Shared HTTP client: UA policy, pooled requests, hooks, stats
(reference: internal/httpclient client_test.go drives a local server)."""

import http.server
import json
import threading

import pytest

from birdnet_go_tpu.utils.httpclient import (
    HttpClient,
    default_user_agent,
    shared_client,
)


class _Handler(http.server.BaseHTTPRequestHandler):
    seen: list[dict] = []

    def _record(self, body=b""):
        type(self).seen.append({
            "method": self.command, "path": self.path,
            "ua": self.headers.get("User-Agent", ""), "body": body})

    def do_GET(self):
        self._record()
        if self.path.startswith("/fail"):
            self.send_response(500)
            self.end_headers()
            return
        payload = json.dumps({"ok": True, "path": self.path}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        self._record(self.rfile.read(n))
        payload = b'{"stored": true}'
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture()
def httpd():
    _Handler.seen = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", _Handler
    srv.shutdown()


def test_user_agent_leading_token_policy():
    ua = default_user_agent()
    # Wikimedia's edge 403s a leading "birdnet-go" token — must stay
    # unhyphenated, with a contact URL
    assert ua.split(" ")[0].lower() == "birdnetgo"
    assert "(" in ua and "http" in ua


def test_get_json_post_json_and_ua_injection(httpd):
    base, handler = httpd
    c = HttpClient(timeout=5.0)
    out = c.get_json(f"{base}/data?x=1")
    assert out["ok"] and out["path"] == "/data?x=1"
    out = c.post_json(f"{base}/ingest", {"a": 1})
    assert out == {"stored": True}
    assert all(r["ua"].startswith("BirdNETGo") for r in handler.seen)
    assert json.loads(handler.seen[-1]["body"]) == {"a": 1}
    c.close()


def test_stats_and_hooks(httpd):
    base, _ = httpd
    c = HttpClient(timeout=5.0)
    calls = []
    c.before_request = lambda m, u: calls.append(("before", m))
    c.after_response = lambda m, u, s, dt: calls.append(("after", s))
    c.get(f"{base}/a")
    r = c.get(f"{base}/fail")
    assert r.status_code == 500
    with pytest.raises(Exception):
        c.get_json(f"{base}/fail")             # raise_for_status on 500
    s = c.stats()
    assert s["requests"] == 3 and s["errors"] == 0
    assert s["by_host"] == {"127.0.0.1": 3}
    assert ("before", "GET") in calls and ("after", 200) in calls
    c.close()


def test_connection_refused_counts_error():
    c = HttpClient(timeout=0.5)
    with pytest.raises(Exception):
        c.get("http://127.0.0.1:1/nothing")
    assert c.stats()["errors"] == 1
    c.close()


def test_shared_client_singleton():
    assert shared_client() is shared_client()


def test_integrations_default_to_shared_pool():
    from birdnet_go_tpu.integrations.ebird import EBirdClient
    from birdnet_go_tpu.integrations.weather import YrNoProvider

    assert YrNoProvider(60.0, 24.0).session is shared_client()
    assert EBirdClient().session is shared_client()

"""AutoTLS / ACME client against an in-process Pebble analogue.

Reference: internal/api/autotls_pebble_test.go validates the Go server's
AutoTLS flow against a Pebble container; here a genuine RFC 8555 server
subset (directory, nonce, JWS-verified account/order/challenge/finalize/
certificate) runs in-process, performs the REAL HTTP-01 fetch against
our API server's /.well-known/acme-challenge route, and signs the CSR
with a test CA — so the whole chain (JWS ES256 signing, nonce replay,
key authorization, CSR, cache, renewal window) is exercised end to end.
"""

from __future__ import annotations

import base64
import datetime
import hashlib
import json
import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

cryptography = pytest.importorskip("cryptography")

from cryptography import x509  # noqa: E402
from cryptography.hazmat.primitives import hashes, serialization  # noqa: E402
from cryptography.hazmat.primitives.asymmetric import ec, utils  # noqa: E402
from cryptography.x509.oid import NameOID  # noqa: E402

from birdnet_go_tpu.utils.acme import (  # noqa: E402
    AcmeClient,
    AutoTlsManager,
    Http01Responder,
)


def _b64d(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class PebbleAnalogue(threading.Thread):
    """Just enough RFC 8555 to certify one order, with real JWS
    verification and a real HTTP-01 fetch."""

    def __init__(self, challenge_port: int):
        super().__init__(daemon=True)
        self.challenge_port = challenge_port
        self.ca_key = ec.generate_private_key(ec.SECP256R1())
        self.ca_cert = self._make_ca()
        self.nonces: set[str] = set()
        self.accounts: dict[str, dict] = {}
        self.orders: dict[str, dict] = {}
        self.authz: dict[str, dict] = {}
        self.certs: dict[str, str] = {}
        self.seen_key_auth: str | None = None
        srv = HTTPServer(("127.0.0.1", 0), self._handler())
        self.port = srv.server_port
        self._srv = srv

    @property
    def url(self):
        return f"http://127.0.0.1:{self.port}"

    def run(self):
        self._srv.serve_forever(poll_interval=0.05)

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()

    def _make_ca(self):
        name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME,
                                             "Pebble Analogue CA")])
        now = datetime.datetime.now(datetime.timezone.utc)
        return (x509.CertificateBuilder()
                .subject_name(name).issuer_name(name)
                .public_key(self.ca_key.public_key())
                .serial_number(x509.random_serial_number())
                .not_valid_before(now)
                .not_valid_after(now + datetime.timedelta(days=3650))
                .add_extension(x509.BasicConstraints(ca=True,
                                                     path_length=None),
                               critical=True)
                .sign(self.ca_key, hashes.SHA256()))

    def _issue(self, csr_der: bytes) -> str:
        csr = x509.load_der_x509_csr(csr_der)
        assert csr.is_signature_valid
        now = datetime.datetime.now(datetime.timezone.utc)
        cert = (x509.CertificateBuilder()
                .subject_name(csr.subject)
                .issuer_name(self.ca_cert.subject)
                .public_key(csr.public_key())
                .serial_number(x509.random_serial_number())
                .not_valid_before(now)
                .not_valid_after(now + datetime.timedelta(days=90))
                .add_extension(
                    csr.extensions.get_extension_for_class(
                        x509.SubjectAlternativeName).value,
                    critical=False)
                .sign(self.ca_key, hashes.SHA256()))
        return (cert.public_bytes(serialization.Encoding.PEM)
                + self.ca_cert.public_bytes(
                    serialization.Encoding.PEM)).decode()

    def _handler(outer_self):  # noqa: N805
        srv = outer_self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _nonce(self):
                import os

                n = base64.urlsafe_b64encode(os.urandom(16)) \
                    .decode().rstrip("=")
                srv.nonces.add(n)
                return n

            def _send(self, code, body=b"", headers=None, ctype=None):
                self.send_response(code)
                self.send_header("Replay-Nonce", self._nonce())
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                if ctype:
                    self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code, obj, headers=None):
                self._send(code, json.dumps(obj).encode(), headers,
                           "application/json")

            def do_GET(self):
                if self.path == "/directory":
                    base = srv.url
                    self._json(200, {
                        "newNonce": f"{base}/new-nonce",
                        "newAccount": f"{base}/new-account",
                        "newOrder": f"{base}/new-order",
                    })
                else:
                    self._send(404)

            def do_HEAD(self):
                self._send(200)

            def _verify_jws(self):
                """Returns (protected, payload_obj, jwk). Enforces the
                nonce and verifies the ES256 signature — the client's
                signing must be REAL."""
                raw = self.rfile.read(
                    int(self.headers["Content-Length"]))
                jws = json.loads(raw)
                protected = json.loads(_b64d(jws["protected"]))
                assert protected["nonce"] in srv.nonces, "bad nonce"
                srv.nonces.discard(protected["nonce"])
                assert protected["url"].endswith(self.path)
                jwk = protected.get("jwk")
                if jwk is None:
                    jwk = srv.accounts[protected["kid"]]["jwk"]
                pub = ec.EllipticCurvePublicNumbers(
                    int.from_bytes(_b64d(jwk["x"]), "big"),
                    int.from_bytes(_b64d(jwk["y"]), "big"),
                    ec.SECP256R1()).public_key()
                sig = _b64d(jws["signature"])
                der = utils.encode_dss_signature(
                    int.from_bytes(sig[:32], "big"),
                    int.from_bytes(sig[32:], "big"))
                pub.verify(der, f"{jws['protected']}.{jws['payload']}"
                           .encode(), ec.ECDSA(hashes.SHA256()))
                payload = (json.loads(_b64d(jws["payload"]))
                           if jws["payload"] else None)
                return protected, payload, jwk

            def do_POST(self):
                protected, payload, jwk = self._verify_jws()
                base = srv.url
                if self.path == "/new-account":
                    kid = f"{base}/acct/{len(srv.accounts) + 1}"
                    srv.accounts[kid] = {"jwk": jwk}
                    self._json(201, {"status": "valid"},
                               {"Location": kid})
                elif self.path == "/new-order":
                    oid = f"o{len(srv.orders) + 1}"
                    domain = payload["identifiers"][0]["value"]
                    import os

                    token = base64.urlsafe_b64encode(os.urandom(12)) \
                        .decode().rstrip("=")
                    aid = f"a{oid}"
                    srv.authz[aid] = {"status": "pending",
                                      "token": token, "domain": domain,
                                      "jwk": jwk}
                    srv.orders[oid] = {"status": "pending",
                                       "authz": aid, "domain": domain}
                    self._json(201, {
                        "status": "pending",
                        "authorizations": [f"{base}/authz/{aid}"],
                        "finalize": f"{base}/finalize/{oid}",
                    }, {"Location": f"{base}/order/{oid}"})
                elif self.path.startswith("/authz/"):
                    a = srv.authz[self.path.split("/")[-1]]
                    self._json(200, {
                        "status": a["status"],
                        "challenges": [{
                            "type": "http-01", "token": a["token"],
                            "url": f"{base}/chall/"
                                   f"{self.path.split('/')[-1]}",
                        }],
                    })
                elif self.path.startswith("/chall/"):
                    aid = self.path.split("/")[-1]
                    a = srv.authz[aid]
                    # REAL HTTP-01 validation fetch
                    import urllib.request

                    url = (f"http://127.0.0.1:{srv.challenge_port}"
                           f"/.well-known/acme-challenge/{a['token']}")
                    with urllib.request.urlopen(url, timeout=5) as r:
                        got = r.read().decode()
                    canon = json.dumps(a["jwk"], separators=(",", ":"),
                                       sort_keys=True).encode()
                    thumb = base64.urlsafe_b64encode(
                        hashlib.sha256(canon).digest()) \
                        .decode().rstrip("=")
                    expect = f"{a['token']}.{thumb}"
                    srv.seen_key_auth = got
                    a["status"] = "valid" if got == expect else "invalid"
                    self._json(200, {"status": a["status"]})
                elif self.path.startswith("/finalize/"):
                    oid = self.path.split("/")[-1]
                    o = srv.orders[oid]
                    assert srv.authz[o["authz"]]["status"] == "valid", \
                        "finalize before authorization"
                    srv.certs[oid] = srv._issue(_b64d(payload["csr"]))
                    o["status"] = "valid"
                    self._json(200, {"status": "valid"})
                elif self.path.startswith("/order/"):
                    oid = self.path.split("/")[-1]
                    o = srv.orders[oid]
                    body = {"status": o["status"]}
                    if o["status"] == "valid":
                        body["certificate"] = f"{base}/cert/{oid}"
                    self._json(200, body)
                elif self.path.startswith("/cert/"):
                    pem = srv.certs[self.path.split("/")[-1]]
                    self._send(200, pem.encode(), None,
                               "application/pem-certificate-chain")
                else:
                    self._send(404)

        return H


class ChallengeHttp(threading.Thread):
    """Tiny HTTP server standing in for the API server's challenge
    route (the full-app variant is covered separately)."""

    def __init__(self, responder: Http01Responder):
        super().__init__(daemon=True)
        resp = responder

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                token = self.path.rsplit("/", 1)[-1]
                ka = resp.get(token)
                if ka is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                body = ka.encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._srv = HTTPServer(("127.0.0.1", 0), H)
        self.port = self._srv.server_port

    def run(self):
        self._srv.serve_forever(poll_interval=0.05)

    def stop(self):
        self._srv.shutdown()
        self._srv.server_close()


@pytest.fixture()
def pebble():
    responder = Http01Responder()
    chall = ChallengeHttp(responder)
    chall.start()
    srv = PebbleAnalogue(chall.port)
    srv.start()
    yield srv, responder
    srv.stop()
    chall.stop()


def test_acme_full_order_flow(tmp_path, pebble):
    srv, responder = pebble
    client = AcmeClient(f"{srv.url}/directory", tmp_path)
    cert_pem, key_pem = client.obtain("birds.example.com", responder,
                                      poll_interval=0.05, timeout=10)
    # server verified the real key authorization over real HTTP
    assert srv.seen_key_auth and "." in srv.seen_key_auth
    cert = x509.load_pem_x509_certificate(cert_pem.encode())
    sans = cert.extensions.get_extension_for_class(
        x509.SubjectAlternativeName).value
    assert list(sans.get_values_for_type(x509.DNSName)) \
        == ["birds.example.com"]
    key = serialization.load_pem_private_key(key_pem.encode(),
                                             password=None)
    assert key.public_key().public_numbers() \
        == cert.public_key().public_numbers()
    # account key persisted for reuse
    assert (tmp_path / "account.key").is_file()


def test_autotls_manager_cache_and_renewal_window(tmp_path, pebble):
    srv, responder = pebble
    mgr = AutoTlsManager(tmp_path, "birds.example.com",
                         directory_url=f"{srv.url}/directory")
    assert mgr.days_remaining() is None
    cert, key = mgr.ensure(responder)
    assert cert.is_file() and key.is_file()
    days = mgr.days_remaining()
    assert days is not None and 85 < days <= 90
    # within validity: ensure() is a cache hit (no new order)
    orders_before = len(srv.orders)
    mgr.ensure(responder)
    assert len(srv.orders) == orders_before
    import ssl

    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert, key)       # chain + key load cleanly


from tests.test_app_integration import tiny_app  # noqa: E402,F401


def test_acme_challenge_route_served_by_api(tiny_app):
    """The real API server serves /.well-known/acme-challenge
    unauthenticated even with auth enabled (reference: ACME validation
    fetches bypass auth)."""
    import urllib.request

    from birdnet_go_tpu.utils.acme import GLOBAL_RESPONDER

    tiny_app.settings.webserver.password = "secret"   # auth ON
    tiny_app.start(warmup=False)
    try:
        port = tiny_app.settings.webserver.port
        GLOBAL_RESPONDER.set("tok123", "tok123.thumbhere")
        url = (f"http://127.0.0.1:{port}"
               "/.well-known/acme-challenge/tok123")
        with urllib.request.urlopen(url, timeout=5) as r:
            assert r.read() == b"tok123.thumbhere"
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}"
                "/.well-known/acme-challenge/absent", timeout=5)
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        GLOBAL_RESPONDER.clear("tok123")
    finally:
        tiny_app.stop()

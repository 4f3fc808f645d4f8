"""OIDC / SSO relying party: JWS verification, flow state, allowlist, and
the full login round-trip through the real server against an in-process
fake identity provider (the containerized-fake-peer testing pattern,
SURVEY.md §4)."""

import base64
import json
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from birdnet_go_tpu.api.oidc import OidcClient, OidcError

from tests.test_app_integration import tiny_app  # fixture


# ------------------------------------------------------------------ key + jwt

def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


@pytest.fixture(scope="module")
def rsa_key():
    from cryptography.hazmat.primitives.asymmetric import rsa

    return rsa.generate_private_key(public_exponent=65537, key_size=2048)


def make_jwks(key, kid="k1"):
    pub = key.public_key().public_numbers()
    n = pub.n.to_bytes((pub.n.bit_length() + 7) // 8, "big")
    e = pub.e.to_bytes(3, "big").lstrip(b"\0")
    return {"keys": [{"kty": "RSA", "kid": kid, "alg": "RS256",
                      "n": _b64url(n), "e": _b64url(e)}]}


def sign_jwt(key, claims, kid="k1", alg="RS256"):
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding

    header = {"alg": alg, "kid": kid, "typ": "JWT"}
    h64 = _b64url(json.dumps(header).encode())
    p64 = _b64url(json.dumps(claims).encode())
    sig = key.sign(f"{h64}.{p64}".encode(), padding.PKCS1v15(),
                   hashes.SHA256())
    return f"{h64}.{p64}.{_b64url(sig)}"


# ------------------------------------------------------------- fake transport

class FakeHttp:
    """Injectable stand-in for the shared HttpClient."""

    def __init__(self, issuer, jwks, id_token_fn):
        self.issuer = issuer
        self.jwks_doc = jwks
        self.id_token_fn = id_token_fn
        self.token_posts = []

    class R:
        def __init__(self, code, body):
            self.status_code = code
            self._body = body

        def json(self):
            return self._body

    def get(self, url, **kw):
        if url.endswith("/.well-known/openid-configuration"):
            return self.R(200, {
                "issuer": self.issuer,
                "authorization_endpoint": self.issuer + "/auth",
                "token_endpoint": self.issuer + "/token",
                "jwks_uri": self.issuer + "/jwks"})
        if url.endswith("/jwks"):
            return self.R(200, self.jwks_doc)
        return self.R(404, {})

    def post(self, url, data=None, **kw):
        self.token_posts.append(data)
        return self.R(200, {"id_token": self.id_token_fn(),
                            "access_token": "at", "token_type": "Bearer"})


def make_client(key, *, claims_extra=None, allowed=None, kid="k1",
                clock=None):
    issuer = "https://idp.test"
    clock = clock or time.time
    state_nonce = {}

    def id_token():
        claims = {"iss": issuer, "aud": "birdnet", "sub": "u1",
                  "email": "alice@example.org",
                  "exp": clock() + 300,
                  "nonce": state_nonce.get("nonce")}
        claims.update(claims_extra or {})
        return sign_jwt(key, claims, kid=kid)

    client = OidcClient(issuer=issuer, client_id="birdnet",
                        client_secret="s3", redirect_uri="http://me/cb",
                        allowed=allowed,
                        http=FakeHttp(issuer, make_jwks(key), id_token),
                        clock=clock)
    return client, state_nonce


def _begin(client, state_nonce):
    state, url = client.begin()
    q = urllib.parse.parse_qs(urllib.parse.urlparse(url).query)
    state_nonce["nonce"] = q["nonce"][0]
    return state, q


# --------------------------------------------------------------------- units

def test_happy_path_flow(rsa_key):
    client, sn = make_client(rsa_key)
    state, q = _begin(client, sn)
    assert q["response_type"] == ["code"]
    assert q["client_id"] == ["birdnet"]
    claims = client.complete(state, "authcode")
    assert claims["email"] == "alice@example.org"
    # state is single-use
    with pytest.raises(OidcError, match="state"):
        client.complete(state, "authcode")


def test_code_exchange_posts_client_secret(rsa_key):
    client, sn = make_client(rsa_key)
    state, _ = _begin(client, sn)
    client.complete(state, "c0de")
    post = client.http.token_posts[-1]
    assert post["grant_type"] == "authorization_code"
    assert post["code"] == "c0de" and post["client_secret"] == "s3"


@pytest.mark.parametrize("extra,match", [
    ({"aud": "someone-else"}, "audience"),
    ({"iss": "https://evil.test"}, "issuer"),
    ({"exp": 1}, "expired"),
    ({"nonce": "forged"}, "nonce"),
])
def test_claim_validation(rsa_key, extra, match):
    client, sn = make_client(rsa_key, claims_extra=extra)
    state, _ = _begin(client, sn)
    with pytest.raises(OidcError, match=match):
        client.complete(state, "x")


def test_bad_signature_rejected(rsa_key):
    from cryptography.hazmat.primitives.asymmetric import rsa as _rsa

    other = _rsa.generate_private_key(public_exponent=65537, key_size=2048)
    # token signed by a DIFFERENT key than the JWKS advertises
    client, sn = make_client(rsa_key)
    client.http.id_token_fn = lambda: sign_jwt(
        other, {"iss": "https://idp.test", "aud": "birdnet",
                "exp": time.time() + 300, "nonce": sn.get("nonce")})
    state, _ = _begin(client, sn)
    with pytest.raises(OidcError, match="signature|no RSA key"):
        client.complete(state, "x")


def test_allowlist_email_and_domain(rsa_key):
    ok, sn = make_client(rsa_key, allowed=["alice@example.org"])
    state, _ = _begin(ok, sn)
    assert ok.complete(state, "x")["sub"] == "u1"
    dom, sn2 = make_client(rsa_key, allowed=["@example.org"])
    state2, _ = _begin(dom, sn2)
    assert dom.complete(state2, "x")
    deny, sn3 = make_client(rsa_key, allowed=["@corp.net"])
    state3, _ = _begin(deny, sn3)
    with pytest.raises(OidcError, match="allowlist"):
        deny.complete(state3, "x")


def test_unsupported_alg_rejected(rsa_key):
    client, sn = make_client(rsa_key)
    tok = sign_jwt(rsa_key, {"iss": "https://idp.test"}, alg="none")
    # alg=none would skip signature checking entirely — must be refused
    with pytest.raises(OidcError, match="alg"):
        client.verify_id_token(tok.rsplit(".", 1)[0] + ".")


# ----------------------------------------------------- e2e through the server

class _IdpHandler(BaseHTTPRequestHandler):
    key = None
    nonces: list = []

    def _json(self, obj, code=200):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        base = f"http://127.0.0.1:{self.server.server_port}"
        if self.path == "/.well-known/openid-configuration":
            self._json({"issuer": base,
                        "authorization_endpoint": base + "/auth",
                        "token_endpoint": base + "/token",
                        "jwks_uri": base + "/jwks"})
        elif self.path == "/jwks":
            self._json(make_jwks(self.key))
        else:
            self._json({}, 404)

    def do_POST(self):
        base = f"http://127.0.0.1:{self.server.server_port}"
        if self.path == "/token":
            claims = {"iss": base, "aud": "birdnet", "sub": "u1",
                      "email": "alice@example.org",
                      "exp": time.time() + 300,
                      "nonce": self.nonces[-1] if self.nonces else None}
            self._json({"id_token": sign_jwt(self.key, claims),
                        "token_type": "Bearer"})
        else:
            self._json({}, 404)

    def log_message(self, *a):
        pass


def test_oidc_login_end_to_end(tiny_app, rsa_key):
    """GET /auth/oidc/login redirects to the IdP; the callback exchanges
    the code against the real token endpoint, verifies the RS256 id_token,
    and issues a working session cookie."""
    _IdpHandler.key = rsa_key
    _IdpHandler.nonces = []
    idp = HTTPServer(("127.0.0.1", 0), _IdpHandler)
    threading.Thread(target=idp.serve_forever, daemon=True).start()
    issuer = f"http://127.0.0.1:{idp.server_port}"

    app = tiny_app
    ws = app.settings.webserver
    ws.password = "hunter2"          # enables security
    ws.oidc_issuer = issuer
    ws.oidc_client_id = "birdnet"
    ws.oidc_client_secret = "s3"
    ws.oidc_allowed = ["@example.org"]
    ws.allow_local_bypass = False
    app.start(warmup=False)
    port = ws.port
    base = f"http://127.0.0.1:{port}"

    class NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, *a, **kw):
            return None

    opener = urllib.request.build_opener(NoRedirect)
    try:
        # unauthenticated API access is denied
        with pytest.raises(urllib.error.HTTPError) as exc:
            opener.open(base + "/api/v2/detections", timeout=10)
        assert exc.value.code == 401

        # step 1: login redirect carries state+nonce to the IdP
        with pytest.raises(urllib.error.HTTPError) as exc:
            opener.open(base + "/api/v2/auth/oidc/login", timeout=10)
        assert exc.value.code == 302
        loc = exc.value.headers["Location"]
        assert loc.startswith(issuer + "/auth?")
        q = urllib.parse.parse_qs(urllib.parse.urlparse(loc).query)
        _IdpHandler.nonces.append(q["nonce"][0])

        # step 2: callback with the provider's code → session cookie
        cb = (f"{base}/api/v2/auth/oidc/callback?"
              f"state={q['state'][0]}&code=fakecode")
        with pytest.raises(urllib.error.HTTPError) as exc:
            opener.open(cb, timeout=10)
        assert exc.value.code == 302
        cookie = exc.value.headers.get("Set-Cookie", "")
        assert "birdnet_session=" in cookie
        sid = cookie.split("birdnet_session=")[1].split(";")[0]

        # the session authenticates API calls
        req = urllib.request.Request(
            base + "/api/v2/detections",
            headers={"Cookie": f"birdnet_session={sid}"})
        with urllib.request.urlopen(req, timeout=10) as r:
            assert r.status == 200

        # forged state is rejected
        with pytest.raises(urllib.error.HTTPError) as exc:
            opener.open(f"{base}/api/v2/auth/oidc/callback?"
                        f"state=bogus&code=x", timeout=10)
        assert exc.value.code == 401
    finally:
        app.stop()
        idp.shutdown()


# -- GitHub social auth (goth GitHub provider role) -------------------------------


class _GhResp:
    def __init__(self, status, data):
        self.status_code = status
        self._data = data

    def json(self):
        return self._data


class _GhHttp:
    """Scripted GitHub API double."""

    def __init__(self, email_public=True):
        self.email_public = email_public
        self.posts = []

    def post(self, url, data=None, headers=None):
        self.posts.append((url, data))
        assert data["code"] == "goodcode"
        return _GhResp(200, {"access_token": "gh_tok"})

    def get(self, url, headers=None):
        assert headers["Authorization"] == "Bearer gh_tok"
        if url.endswith("/user"):
            return _GhResp(200, {
                "login": "OctoCat",
                "email": "cat@example.com" if self.email_public else None})
        if url.endswith("/user/emails"):
            return _GhResp(200, [
                {"email": "alt@example.com", "primary": False,
                 "verified": True},
                {"email": "cat@example.com", "primary": True,
                 "verified": True}])
        raise AssertionError(url)


def test_github_flow_and_allowlist():
    from birdnet_go_tpu.api.github_auth import GithubAuthError, GithubClient

    client = GithubClient("cid", "csec", "http://cb",
                          allowed=["cat@example.com"], http=_GhHttp())
    state, url = client.begin()
    assert "github.com/login/oauth/authorize" in url and state in url
    who = client.complete(state, "goodcode")
    assert who == {"email": "cat@example.com", "login": "octocat"}

    # private email resolves via /user/emails (primary verified)
    client = GithubClient("cid", "csec", "http://cb",
                          allowed=["@example.com"],
                          http=_GhHttp(email_public=False))
    state, _ = client.begin()
    assert client.complete(state, "goodcode")["email"] == "cat@example.com"

    # login-based allowlist entry
    client = GithubClient("cid", "csec", "http://cb",
                          allowed=["login:octocat"], http=_GhHttp())
    state, _ = client.begin()
    assert client.complete(state, "goodcode")["login"] == "octocat"

    # not in allowlist
    client = GithubClient("cid", "csec", "http://cb",
                          allowed=["other@example.com"], http=_GhHttp())
    state, _ = client.begin()
    import pytest

    with pytest.raises(GithubAuthError, match="allowlist"):
        client.complete(state, "goodcode")

    # unknown state
    with pytest.raises(GithubAuthError, match="state"):
        client.complete("bogus", "goodcode")

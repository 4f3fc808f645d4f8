"""Cloudflare Access bypass (doc/wiki/security.md): JWT validated
against the team's JWKS — signature, issuer, expiry, audience."""

from __future__ import annotations

import base64
import json
import time

import pytest

from birdnet_go_tpu.api.cloudflare import CloudflareAccessVerifier


def _b64url(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).rstrip(b"=").decode()


@pytest.fixture(scope="module")
def rsa_key():
    from cryptography.hazmat.primitives.asymmetric import rsa

    return rsa.generate_private_key(public_exponent=65537, key_size=2048)


def _jwks(key, kid="k1"):
    pub = key.public_key().public_numbers()
    return {"keys": [{
        "kty": "RSA", "kid": kid, "alg": "RS256",
        "n": _b64url(pub.n.to_bytes((pub.n.bit_length() + 7) // 8, "big")),
        "e": _b64url(pub.e.to_bytes(3, "big")),
    }]}


def _jwt(key, claims, kid="k1", alg="RS256"):
    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import padding

    header = _b64url(json.dumps({"alg": alg, "kid": kid}).encode())
    payload = _b64url(json.dumps(claims).encode())
    sig = key.sign(f"{header}.{payload}".encode(), padding.PKCS1v15(),
                   hashes.SHA256())
    return f"{header}.{payload}.{_b64url(sig)}"


class _Resp:
    def __init__(self, data):
        self._data = data

    def raise_for_status(self):
        pass

    def json(self):
        return self._data


class _Session:
    def __init__(self, jwks):
        self.jwks = jwks
        self.calls = 0

    def get(self, url):
        self.calls += 1
        assert url == "https://team.cloudflareaccess.com/cdn-cgi/access/certs"
        return _Resp(self.jwks)


def _verifier(key, audience=""):
    return CloudflareAccessVerifier(
        "team.cloudflareaccess.com", audience=audience,
        session=_Session(_jwks(key)))


def test_valid_token_accepted(rsa_key):
    v = _verifier(rsa_key, audience="policy-aud")
    claims = {"iss": "https://team.cloudflareaccess.com",
              "aud": ["policy-aud"], "exp": time.time() + 600,
              "email": "user@example.com"}
    out = v.verify(_jwt(rsa_key, claims))
    assert out and out["email"] == "user@example.com"


def test_rejections(rsa_key):
    v = _verifier(rsa_key, audience="policy-aud")
    base = {"iss": "https://team.cloudflareaccess.com",
            "aud": ["policy-aud"], "exp": time.time() + 600}
    # expired
    assert v.verify(_jwt(rsa_key, {**base, "exp": time.time() - 5})) is None
    # wrong issuer
    assert v.verify(_jwt(rsa_key, {**base,
                                   "iss": "https://evil.example"})) is None
    # wrong audience
    assert v.verify(_jwt(rsa_key, {**base, "aud": ["other"]})) is None
    # tampered payload (signature over different bytes)
    good = _jwt(rsa_key, base)
    h, p, s = good.split(".")
    forged_payload = _b64url(json.dumps(
        {**base, "email": "attacker@example.com"}).encode())
    assert v.verify(f"{h}.{forged_payload}.{s}") is None
    # alg confusion: HS256/none must never pass
    assert v.verify(_jwt(rsa_key, base, alg="none")) is None
    # garbage
    assert v.verify("not-a-jwt") is None


def test_key_rotation_and_negative_kid_cache(rsa_key):
    from cryptography.hazmat.primitives.asymmetric import rsa as _rsa

    new_key = _rsa.generate_private_key(public_exponent=65537, key_size=2048)
    sess = _Session(_jwks(rsa_key, kid="old"))
    t = [1000.0]
    v = CloudflareAccessVerifier("team.cloudflareaccess.com", session=sess,
                                 clock=lambda: t[0])
    claims = {"iss": "https://team.cloudflareaccess.com",
              "exp": time.time() + 24 * 3600}
    tok = _jwt(new_key, claims, kid="new")
    assert v.verify(tok) is None          # unknown kid, refresh didn't help
    assert sess.calls == 2                # one forced rotation refresh
    # negative kid cache: self-minted random-kid tokens must NOT drive a
    # JWKS fetch per request (DoS amplifier)
    assert v.verify(tok) is None
    assert sess.calls == 2                # no extra fetch inside the TTL
    # after the TTL the rotated key is picked up normally
    sess.jwks = _jwks(new_key, kid="new")
    t[0] += 3601
    assert v.verify(tok) is not None
    # trailing slash / scheme in the configured team domain is tolerated
    v2 = CloudflareAccessVerifier("https://team.cloudflareaccess.com/",
                                  session=_Session(_jwks(rsa_key)))
    assert v2.issuer == "https://team.cloudflareaccess.com"

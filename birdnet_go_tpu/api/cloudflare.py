"""Cloudflare Access authentication bypass.

Reference: internal/security Cloudflare bypass (doc/wiki/security.md
"Cloudflare Access Authentication Bypass"): requests arriving through a
Cloudflare tunnel carry a `Cf-Access-Jwt-Assertion` JWT; when the bypass
is enabled the request is trusted iff the token verifies against the
team's JWKS (RS256), is unexpired, was issued by the team domain, and —
when configured — carries the expected policy audience.
"""

from __future__ import annotations

import base64
import json
import logging
import time

log = logging.getLogger("birdnet_tpu.cloudflare")

JWT_HEADER = "Cf-Access-Jwt-Assertion"
_CERTS_TTL = 3600.0


def _b64url(data: str | bytes) -> bytes:
    if isinstance(data, str):
        data = data.encode()
    return base64.urlsafe_b64decode(data + b"=" * (-len(data) % 4))


class CloudflareAccessVerifier:
    """Validates Cloudflare Access JWTs against the team's JWKS."""

    def __init__(self, team_domain: str, audience: str = "",
                 session=None, clock=time.time):
        self.team_domain = team_domain.strip().removeprefix("https://")
        self.audience = audience
        self.clock = clock
        self._session = session
        self._keys: dict[str, object] = {}
        self._fetched_at = 0.0

    @property
    def issuer(self) -> str:
        return f"https://{self.team_domain}"

    def _jwks_url(self) -> str:
        return f"https://{self.team_domain}/cdn-cgi/access/certs"

    def _refresh_keys(self) -> None:
        if self._keys and self.clock() - self._fetched_at < _CERTS_TTL:
            return
        from cryptography.hazmat.primitives.asymmetric.rsa import (
            RSAPublicNumbers,
        )

        if self._session is None:
            from birdnet_go_tpu.utils.httpclient import shared_client

            self._session = shared_client()
        resp = self._session.get(self._jwks_url())
        resp.raise_for_status()
        keys = {}
        for jwk in resp.json().get("keys", []):
            if jwk.get("kty") != "RSA":
                continue
            n = int.from_bytes(_b64url(jwk["n"]), "big")
            e = int.from_bytes(_b64url(jwk["e"]), "big")
            keys[jwk.get("kid", "")] = RSAPublicNumbers(e, n).public_key()
        self._keys = keys
        self._fetched_at = self.clock()

    def verify(self, token: str) -> dict | None:
        """Claims dict when the token is valid; None otherwise."""
        try:
            header_b64, payload_b64, sig_b64 = token.split(".")
            header = json.loads(_b64url(header_b64))
            claims = json.loads(_b64url(payload_b64))
            if header.get("alg") != "RS256":
                return None
            self._refresh_keys()
            key = self._keys.get(header.get("kid", ""))
            if key is None:
                # key rotation: one forced refresh per unknown kid
                self._fetched_at = 0.0
                self._refresh_keys()
                key = self._keys.get(header.get("kid", ""))
            if key is None:
                return None
            from cryptography.hazmat.primitives import hashes
            from cryptography.hazmat.primitives.asymmetric import padding

            key.verify(_b64url(sig_b64),
                       f"{header_b64}.{payload_b64}".encode(),
                       padding.PKCS1v15(), hashes.SHA256())
            now = self.clock()
            if claims.get("exp", 0) < now:
                return None
            if claims.get("iss") != self.issuer:
                return None
            if self.audience:
                aud = claims.get("aud", [])
                if isinstance(aud, str):
                    aud = [aud]
                if self.audience not in aud:
                    return None
            return claims
        except Exception:
            log.debug("cloudflare access token rejected", exc_info=True)
            return None

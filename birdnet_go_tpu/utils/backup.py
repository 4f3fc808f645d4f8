"""Backup manager: sources → archives → targets, with a scheduler.

Reference: internal/backup (8.6k LoC) — sources (sqlite DB via the online
backup API, config files), targets (local/FTP/SFTP/S3/rsync/GDrive),
optional encryption, retention of N archives, scheduled runs. This
implements the sqlite+config sources, the local-directory target, gzip
tar archives, SHA-256 manifests, and retention; remote targets plug in
behind the same Target protocol.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import hashlib
import io
import json
import logging
import sqlite3
import tarfile
import threading
import time
from pathlib import Path
from typing import Protocol

log = logging.getLogger("birdnet_tpu.backup")


@dataclasses.dataclass
class BackupConfig:
    enabled: bool = False
    target_dir: str = "data/backups"
    keep: int = 7
    include_config: str | None = None      # path to config.yaml
    interval_hours: float = 24.0
    # passphrase → AES-256-GCM encrypted archives (reference:
    # internal/backup encryption of archives before upload)
    passphrase: str = ""


_ENC_MAGIC = b"BNBK1\0"


def encrypt_backup(data: bytes, passphrase: str) -> bytes:
    """AES-256-GCM with a scrypt-derived key. Layout:
    magic(6) | salt(16) | nonce(12) | ciphertext+tag."""
    import os

    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    from cryptography.hazmat.primitives.kdf.scrypt import Scrypt

    salt = os.urandom(16)
    key = Scrypt(salt=salt, length=32, n=2 ** 14, r=8, p=1).derive(
        passphrase.encode())
    nonce = os.urandom(12)
    ct = AESGCM(key).encrypt(nonce, data, _ENC_MAGIC)
    return _ENC_MAGIC + salt + nonce + ct


def decrypt_backup(blob: bytes, passphrase: str) -> bytes:
    """Inverse of encrypt_backup; raises ValueError on wrong passphrase
    or tampered data (GCM tag)."""
    from cryptography.exceptions import InvalidTag
    from cryptography.hazmat.primitives.ciphers.aead import AESGCM
    from cryptography.hazmat.primitives.kdf.scrypt import Scrypt

    if not blob.startswith(_ENC_MAGIC):
        raise ValueError("not an encrypted backup")
    salt = blob[6:22]
    nonce = blob[22:34]
    key = Scrypt(salt=salt, length=32, n=2 ** 14, r=8, p=1).derive(
        passphrase.encode())
    try:
        return AESGCM(key).decrypt(nonce, blob[34:], _ENC_MAGIC)
    except InvalidTag as e:
        raise ValueError("wrong passphrase or corrupted archive") from e


class Target(Protocol):
    def store(self, name: str, data: bytes) -> None: ...

    def list(self) -> list[str]: ...

    def delete(self, name: str) -> None: ...


class LocalTarget:
    def __init__(self, directory: str | Path):
        self.dir = Path(directory)

    def store(self, name: str, data: bytes) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.dir / (name + ".tmp")
        tmp.write_bytes(data)
        tmp.rename(self.dir / name)

    def list(self) -> list[str]:
        if not self.dir.is_dir():
            return []
        return sorted(p.name for p in self.dir.iterdir()
                      if p.suffix in (".gz", ".enc"))

    def delete(self, name: str) -> None:
        (self.dir / name).unlink(missing_ok=True)


class FtpTarget:
    """FTP target via stdlib ftplib (reference: backup FTP target)."""

    def __init__(self, host: str, user: str = "anonymous",
                 password: str = "", directory: str = "/",
                 port: int = 21, tls: bool = False, timeout: float = 30.0):
        self.host, self.port = host, port
        self.user, self.password = user, password
        self.directory = directory
        self.tls = tls
        self.timeout = timeout

    def _connect(self):
        import ftplib

        ftp = (ftplib.FTP_TLS if self.tls else ftplib.FTP)(timeout=self.timeout)
        ftp.connect(self.host, self.port)
        ftp.login(self.user, self.password)
        if self.tls:
            ftp.prot_p()
        if self.directory and self.directory != "/":
            ftp.cwd(self.directory)
        return ftp

    def store(self, name: str, data: bytes) -> None:
        ftp = self._connect()
        try:
            ftp.storbinary(f"STOR {name}.tmp", io.BytesIO(data))
            ftp.rename(f"{name}.tmp", name)     # atomic-ish publish
        finally:
            ftp.quit()

    def list(self) -> list[str]:
        ftp = self._connect()
        try:
            return sorted(n for n in ftp.nlst()
                          if n.endswith((".gz", ".enc")))
        finally:
            ftp.quit()

    def delete(self, name: str) -> None:
        ftp = self._connect()
        try:
            ftp.delete(name)
        finally:
            ftp.quit()


class S3Target:
    """S3-compatible target with from-scratch SigV4 signing (reference:
    backup S3 target; no AWS SDK in this image)."""

    def __init__(self, bucket: str, access_key: str, secret_key: str,
                 region: str = "us-east-1", prefix: str = "backups/",
                 endpoint: str | None = None, session=None,
                 clock=time.time):
        import httpx

        self.bucket = bucket
        self.access_key, self.secret_key = access_key, secret_key
        self.region = region
        self.prefix = prefix
        self.endpoint = (endpoint
                         or f"https://{bucket}.s3.{region}.amazonaws.com")
        self.session = session or httpx.Client(timeout=60.0)
        self.clock = clock

    # SigV4 (https://docs.aws.amazon.com/general/latest/gr/sigv4.html)
    def _sign(self, method: str, path: str, payload: bytes,
              query: str = "") -> dict[str, str]:
        import hmac
        from urllib.parse import urlparse

        host = urlparse(self.endpoint).netloc
        now = _dt.datetime.fromtimestamp(self.clock(), _dt.timezone.utc)
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        datestamp = now.strftime("%Y%m%d")
        payload_hash = hashlib.sha256(payload).hexdigest()
        headers = {
            "host": host,
            "x-amz-content-sha256": payload_hash,
            "x-amz-date": amz_date,
        }
        signed = ";".join(sorted(headers))
        canonical = "\n".join([
            method, path, query,
            "".join(f"{k}:{headers[k]}\n" for k in sorted(headers)),
            signed, payload_hash])
        scope = f"{datestamp}/{self.region}/s3/aws4_request"
        to_sign = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope,
                             hashlib.sha256(canonical.encode()).hexdigest()])

        def _hmac(key: bytes, msg: str) -> bytes:
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        k = _hmac(("AWS4" + self.secret_key).encode(), datestamp)
        k = _hmac(k, self.region)
        k = _hmac(k, "s3")
        k = _hmac(k, "aws4_request")
        signature = hmac.new(k, to_sign.encode(), hashlib.sha256).hexdigest()
        headers["Authorization"] = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope},"
            f" SignedHeaders={signed}, Signature={signature}")
        return headers

    def _request(self, method: str, name: str = "", query: str = "",
                 payload: bytes = b""):
        path = "/" + self.prefix + name if name else "/"
        headers = self._sign(method, path, payload, query)
        url = self.endpoint + path + (f"?{query}" if query else "")
        r = self.session.request(method, url, content=payload or None,
                                 headers=headers)
        r.raise_for_status()
        return r

    def store(self, name: str, data: bytes) -> None:
        self._request("PUT", name, payload=data)

    def list(self) -> list[str]:
        import re

        r = self._request("GET", query="list-type=2&prefix="
                          + self.prefix.replace("/", "%2F"))
        keys = re.findall(r"<Key>([^<]+)</Key>", r.text)
        return sorted(k[len(self.prefix):] for k in keys
                      if k.endswith((".gz", ".enc")))

    def delete(self, name: str) -> None:
        self._request("DELETE", name)


def snapshot_sqlite(db_path: str) -> bytes:
    """Consistent online snapshot via the sqlite backup API (works while
    the live connection keeps writing — the WAL equivalent of the
    reference's sqlite source)."""
    src = sqlite3.connect(db_path)
    try:
        buf = sqlite3.connect(":memory:")
        src.backup(buf)
        return b"".join(line.encode() + b"\n" for line in buf.iterdump())
    finally:
        src.close()


class BackupManager:
    def __init__(self, config: BackupConfig, db_path: str,
                 target: Target | None = None):
        self.config = config
        self.db_path = db_path
        self.target = target or LocalTarget(config.target_dir)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.runs = 0
        self.failures = 0

    def run_once(self) -> str:
        """Create one archive; returns its name."""
        stamp = _dt.datetime.now().strftime("%Y%m%dT%H%M%S%f")
        name = f"birdnet-backup-{stamp}.tar.gz"
        manifest: dict[str, str] = {}
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tar:
            def add(arcname: str, data: bytes):
                manifest[arcname] = hashlib.sha256(data).hexdigest()
                info = tarfile.TarInfo(arcname)
                info.size = len(data)
                info.mtime = int(time.time())
                tar.addfile(info, io.BytesIO(data))

            if Path(self.db_path).is_file():
                add("database.sql", snapshot_sqlite(self.db_path))
            if self.config.include_config \
                    and Path(self.config.include_config).is_file():
                add("config.yaml",
                    Path(self.config.include_config).read_bytes())
            add("manifest.json", json.dumps(manifest, indent=2).encode())
        payload = buf.getvalue()
        if self.config.passphrase:
            payload = encrypt_backup(payload, self.config.passphrase)
            name += ".enc"
        self.target.store(name, payload)
        self.runs += 1
        self._apply_retention()
        log.info("backup written: %s (%d bytes)", name, buf.tell())
        return name

    def _apply_retention(self) -> None:
        archives = self.target.list()
        excess = len(archives) - self.config.keep
        for name in archives[:max(excess, 0)]:
            self.target.delete(name)

    def start(self) -> None:
        if not self.config.enabled:
            return
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, name="backup",
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def _run(self) -> None:
        while not self._stop.wait(self.config.interval_hours * 3600):
            try:
                self.run_once()
            except Exception:
                self.failures += 1
                log.exception("backup failed")

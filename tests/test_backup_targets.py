"""Backup remote targets: FTP (against a minimal in-process FTP server)
and S3 with SigV4 signing (reference: internal/backup targets)."""

import io
import socket
import threading
from pathlib import Path

import pytest

from birdnet_go_tpu.utils.backup import (
    BackupConfig,
    BackupManager,
    FtpTarget,
    S3Target,
)


class MiniFtpServer(threading.Thread):
    """Just enough RFC 959 for the FtpTarget: USER/PASS, PASV, STOR,
    RNFR/RNTO, NLST, DELE, CWD, QUIT."""

    def __init__(self, root: Path, password="pw"):
        super().__init__(daemon=True)
        self.root = root
        self.password = password
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(2)
        self.port = self._srv.getsockname()[1]
        self._stop = False

    def run(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                self._session(conn)
            except (OSError, ConnectionError):
                pass
            finally:
                conn.close()

    def _session(self, conn):
        f = conn.makefile("rb")

        def send(line):
            conn.sendall((line + "\r\n").encode())

        send("220 mini ftp")
        data_srv = None
        rnfr = None
        while True:
            line = f.readline().decode().strip()
            if not line:
                return
            cmd, _, arg = line.partition(" ")
            cmd = cmd.upper()
            if cmd == "USER":
                send("331 need password")
            elif cmd == "PASS":
                send("230 ok" if arg == self.password
                     else "530 bad password")
            elif cmd == "TYPE":
                send("200 ok")
            elif cmd == "CWD":
                send("250 ok")
            elif cmd == "PASV":
                data_srv = socket.socket()
                data_srv.bind(("127.0.0.1", 0))
                data_srv.listen(1)
                p = data_srv.getsockname()[1]
                send(f"227 entering passive (127,0,0,1,{p >> 8},{p & 255})")
            elif cmd == "STOR":
                send("150 ok")
                d, _ = data_srv.accept()
                buf = b""
                while True:
                    chunk = d.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
                d.close()
                (self.root / arg).write_bytes(buf)
                send("226 done")
            elif cmd == "RNFR":
                rnfr = arg
                send("350 ok")
            elif cmd == "RNTO":
                (self.root / rnfr).rename(self.root / arg)
                send("250 ok")
            elif cmd == "NLST":
                send("150 ok")
                d, _ = data_srv.accept()
                for p in sorted(self.root.iterdir()):
                    d.sendall((p.name + "\r\n").encode())
                d.close()
                send("226 done")
            elif cmd == "DELE":
                (self.root / arg).unlink()
                send("250 ok")
            elif cmd == "QUIT":
                send("221 bye")
                return
            else:
                send("502 not implemented")

    def stop(self):
        self._stop = True
        self._srv.close()


def test_ftp_target_store_list_delete(tmp_path):
    srv = MiniFtpServer(tmp_path)
    srv.start()
    try:
        t = FtpTarget("127.0.0.1", user="u", password="pw", port=srv.port)
        t.store("b1.tar.gz", b"archive-one")
        t.store("b2.tar.gz", b"archive-two")
        assert (tmp_path / "b1.tar.gz").read_bytes() == b"archive-one"
        assert t.list() == ["b1.tar.gz", "b2.tar.gz"]
        t.delete("b1.tar.gz")
        assert t.list() == ["b2.tar.gz"]
    finally:
        srv.stop()


def test_ftp_target_bad_password(tmp_path):
    import ftplib

    srv = MiniFtpServer(tmp_path)
    srv.start()
    try:
        t = FtpTarget("127.0.0.1", user="u", password="wrong",
                      port=srv.port)
        with pytest.raises(ftplib.error_perm):
            t.store("x.tar.gz", b"data")
    finally:
        srv.stop()


def test_backup_manager_over_ftp(tmp_path):
    """Full backup flow (sqlite snapshot → tar.gz → remote target →
    retention) against the FTP server."""
    import sqlite3

    db = tmp_path / "b.db"
    c = sqlite3.connect(db)
    c.execute("CREATE TABLE t (x INTEGER)")
    c.execute("INSERT INTO t VALUES (42)")
    c.commit()
    c.close()

    ftp_root = tmp_path / "ftp"
    ftp_root.mkdir()
    srv = MiniFtpServer(ftp_root)
    srv.start()
    try:
        mgr = BackupManager(
            BackupConfig(enabled=True, keep=2), db_path=str(db),
            target=FtpTarget("127.0.0.1", user="u", password="pw",
                             port=srv.port))
        for _ in range(3):
            mgr.run_once()
        archives = sorted(p.name for p in ftp_root.iterdir())
        assert len(archives) == 2                 # retention applied
        import tarfile

        with tarfile.open(ftp_root / archives[-1]) as tar:
            names = tar.getnames()
            assert "database.sql" in names and "manifest.json" in names
            sql = tar.extractfile("database.sql").read().decode()
            assert "INSERT INTO" in sql and "42" in sql
    finally:
        srv.stop()


# -- S3 SigV4 -----------------------------------------------------------------------------

class _FakeS3Session:
    def __init__(self):
        self.requests = []
        self.text = "<ListBucketResult><Contents><Key>backups/a.tar.gz" \
                    "</Key></Contents></ListBucketResult>"

    def request(self, method, url, content=None, headers=None):
        self.requests.append((method, url, content, headers))

        class R:
            text = self.text

            @staticmethod
            def raise_for_status():
                pass

        return R()


def test_s3_target_sigv4_structure():
    sess = _FakeS3Session()
    clock = lambda: 1700000000.0                   # deterministic signing
    t = S3Target("bkt", "AKIDEXAMPLE", "secret", region="eu-west-1",
                 session=sess, clock=clock)
    t.store("b1.tar.gz", b"payload")
    method, url, content, headers = sess.requests[0]
    assert method == "PUT" and url.endswith("/backups/b1.tar.gz")
    assert content == b"payload"
    auth = headers["Authorization"]
    assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
    assert "/eu-west-1/s3/aws4_request" in auth
    assert "SignedHeaders=host;x-amz-content-sha256;x-amz-date" in auth
    import hashlib

    assert headers["x-amz-content-sha256"] == \
        hashlib.sha256(b"payload").hexdigest()
    # deterministic: same request signs identically; secret changes it
    t2 = S3Target("bkt", "AKIDEXAMPLE", "secret", region="eu-west-1",
                  session=_FakeS3Session(), clock=clock)
    t2.store("b1.tar.gz", b"payload")
    assert t2.session.requests[0][3]["Authorization"] == auth
    t3 = S3Target("bkt", "AKIDEXAMPLE", "OTHER", region="eu-west-1",
                  session=_FakeS3Session(), clock=clock)
    t3.store("b1.tar.gz", b"payload")
    assert t3.session.requests[0][3]["Authorization"] != auth

    assert t.list() == ["a.tar.gz"]
    t.delete("a.tar.gz")
    assert sess.requests[-1][0] == "DELETE"


def test_encrypted_backup_roundtrip(tmp_path):
    """passphrase → AES-256-GCM archives; decrypt restores the tarball,
    a wrong passphrase or bit-flip fails the GCM tag (reference:
    internal/backup encryption)."""
    import io
    import sqlite3
    import tarfile

    import pytest

    from birdnet_go_tpu.utils.backup import (
        BackupConfig,
        BackupManager,
        decrypt_backup,
        encrypt_backup,
    )

    db = tmp_path / "d.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE t (x)")
    conn.execute("INSERT INTO t VALUES (42)")
    conn.commit()
    conn.close()
    mgr = BackupManager(
        BackupConfig(enabled=True, target_dir=str(tmp_path / "bk"),
                     passphrase="hunter2"), db_path=str(db))
    name = mgr.run_once()
    assert name.endswith(".tar.gz.enc")
    blob = (tmp_path / "bk" / name).read_bytes()
    assert blob[:5] == b"BNBK1"          # not a plaintext tarball
    plain = decrypt_backup(blob, "hunter2")
    with tarfile.open(fileobj=io.BytesIO(plain), mode="r:gz") as tar:
        assert "database.sql" in tar.getnames()
        assert "manifest.json" in tar.getnames()
    with pytest.raises(ValueError, match="passphrase|corrupted"):
        decrypt_backup(blob, "wrong")
    tampered = blob[:-1] + bytes([blob[-1] ^ 1])
    with pytest.raises(ValueError):
        decrypt_backup(tampered, "hunter2")
    # retention sees .enc archives
    assert mgr.target.list() == [name]
    # plaintext round-trip helper symmetry
    assert decrypt_backup(encrypt_backup(b"x", "p"), "p") == b"x"


# -- SFTP (batch-mode client against an in-process batch interpreter) -------------


class FakeSftpRunner:
    """In-process stand-in for the OpenSSH sftp batch client: interprets
    the exact batch commands SftpTarget emits (put/rename/ls/rm/get)
    against a local directory — validating the batch protocol without a
    real SSH server (VERDICT r3 #6: round-trip per target vs fakes)."""

    def __init__(self, root: Path):
        self.root = root
        self.batches: list[str] = []

    def __call__(self, batch: str, workdir: str):
        self.batches.append(batch)
        out = []
        for line in batch.splitlines():
            parts = line.split()
            if not parts:
                continue
            cmd = parts[0]
            if cmd == "put":
                local, remote = parts[1], parts[2]
                dst = self.root / remote
                dst.parent.mkdir(parents=True, exist_ok=True)
                dst.write_bytes((Path(workdir) / local).read_bytes())
            elif cmd == "rename":
                (self.root / parts[1]).rename(self.root / parts[2])
            elif cmd == "ls":
                d = self.root / parts[-1]
                if not d.is_dir():
                    return 1, f"ls: {parts[-1]}: no such directory"
                out += [f"{parts[-1]}/{p.name}" for p in sorted(d.iterdir())]
            elif cmd == "rm":
                p = self.root / parts[1]
                if not p.exists():
                    return 1, f"rm: {parts[1]}: not found"
                p.unlink()
            elif cmd == "get":
                src = self.root / parts[1]
                if not src.is_file():
                    return 1, f"get: {parts[1]}: not found"
                (Path(workdir) / parts[2]).write_bytes(src.read_bytes())
        return 0, "\n".join(out)


def test_sftp_target_round_trip(tmp_path):
    from birdnet_go_tpu.utils.backup import SftpTarget

    runner = FakeSftpRunner(tmp_path / "remote")
    (tmp_path / "remote" / "backups").mkdir(parents=True)
    t = SftpTarget("h", "u", directory="backups", runner=runner)
    t.store("a.tar.gz", b"alpha")
    t.store("b.tar.gz.enc", b"beta")
    assert t.list() == ["a.tar.gz", "b.tar.gz.enc"]
    assert t.fetch("b.tar.gz.enc") == b"beta"
    t.delete("a.tar.gz")
    assert t.list() == ["b.tar.gz.enc"]
    # atomic publish: every store uploads to .tmp then renames
    puts = [b for b in runner.batches if b.startswith("put")]
    assert all(".tmp" in b.splitlines()[0] and "rename" in b for b in puts)
    # a failing batch surfaces as an error, not silence
    with pytest.raises(RuntimeError):
        t.delete("missing.tar.gz")


def test_rsync_target_mirrors_staging(tmp_path):
    from birdnet_go_tpu.utils.backup import RsyncTarget

    dest = tmp_path / "dest"
    synced = []

    def fake_rsync(args):
        # emulate `rsync -a --delete staging/ dest/`
        import shutil

        synced.append(list(args))
        src, dst = args[-2], args[-1]
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(src, dst)
        return 0, ""

    t = RsyncTarget(str(dest), tmp_path / "staging", runner=fake_rsync)
    t.store("a.tar.gz", b"alpha")
    t.store("b.tar.gz", b"beta")
    assert sorted(p.name for p in dest.iterdir()) == ["a.tar.gz",
                                                      "b.tar.gz"]
    t.delete("a.tar.gz")
    assert [p.name for p in dest.iterdir()] == ["b.tar.gz"]
    assert t.fetch("b.tar.gz") == b"beta"
    assert all(a[:2] == ["-a", "--delete"] for a in synced)


# -- restore verification -----------------------------------------------------------


def _mgr_with_db(tmp_path, passphrase=""):
    import sqlite3

    tmp_path.mkdir(parents=True, exist_ok=True)
    db = tmp_path / "d.db"
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE detections (id INTEGER PRIMARY KEY,"
                 " species TEXT)")
    conn.executemany("INSERT INTO detections (species) VALUES (?)",
                     [("Turdus merula",), ("Strix aluco",)])
    conn.commit()
    conn.close()
    cfg = BackupConfig(enabled=True, target_dir=str(tmp_path / "bk"),
                       keep=5, passphrase=passphrase)
    return BackupManager(cfg, str(db))


@pytest.mark.parametrize("passphrase", ["", "hunter2"])
def test_backup_verify_round_trip(tmp_path, passphrase):
    mgr = _mgr_with_db(tmp_path, passphrase)
    name = mgr.run_once()
    report = mgr.verify()           # latest
    assert report["archive"] == name
    assert report["files"]["database.sql"]["sha256_ok"]
    assert report["database"]["integrity"] == "ok"
    assert report["database"]["tables"]["detections"] == 2


def test_backup_verify_detects_corruption(tmp_path):
    from birdnet_go_tpu.utils.backup import verify_archive

    mgr = _mgr_with_db(tmp_path)
    name = mgr.run_once()
    path = tmp_path / "bk" / name
    blob = bytearray(path.read_bytes())
    # flip one byte inside the gzip stream → checksum/untar must fail
    blob[len(blob) // 2] ^= 0xFF
    with pytest.raises(Exception):
        verify_archive(bytes(blob))
    # encrypted archive without passphrase → explicit error
    mgr2 = _mgr_with_db(tmp_path / "e", "pw")
    n2 = mgr2.run_once()
    with pytest.raises(ValueError, match="passphrase"):
        verify_archive((tmp_path / "e" / "bk" / n2).read_bytes())


def test_build_target_dispatch(tmp_path):
    from birdnet_go_tpu.config.settings import BackupSettings
    from birdnet_go_tpu.utils.backup import (
        LocalTarget,
        RsyncTarget,
        SftpTarget,
        build_target,
    )

    s = BackupSettings(target_dir=str(tmp_path))
    assert isinstance(build_target(s), LocalTarget)
    s = BackupSettings(target="sftp",
                       remote={"host": "h", "user": "u"})
    assert isinstance(build_target(s), SftpTarget)
    s = BackupSettings(target="rsync", target_dir=str(tmp_path / "st"),
                       remote={"dest": "h:/backups"})
    t = build_target(s)
    assert isinstance(t, RsyncTarget) and t.dest == "h:/backups"
    with pytest.raises(ValueError):
        build_target(BackupSettings(target="webdav"))


def test_verify_reports_archive_encryption_not_caller_passphrase(tmp_path):
    """An unencrypted archive verified by a manager WITH a passphrase
    configured must report encrypted=False (the field describes the
    archive, not the caller input)."""
    from birdnet_go_tpu.utils.backup import verify_archive

    mgr = _mgr_with_db(tmp_path)                 # writes unencrypted
    name = mgr.run_once()
    blob = (tmp_path / "bk" / name).read_bytes()
    report = verify_archive(blob, passphrase="configured-but-unused")
    assert report["encrypted"] is False


# -- Google Drive (against an in-process Drive v3 fake) ----------------------------


class FakeDriveSession:
    """In-process Drive v3 + OAuth2 token fake: refresh-token exchange,
    multipart upload, q-filtered list, delete, alt=media download —
    the endpoints GDriveTarget drives (reference gdrive.go)."""

    def __init__(self):
        self.files: dict[str, tuple[str, bytes]] = {}   # id → (name, data)
        self.token_calls = 0
        self._next = 1

    class _R:
        def __init__(self, code=200, body=None, content=b""):
            self.status_code = code
            self._body = body
            self.content = content

        def json(self):
            return self._body

        def raise_for_status(self):
            if self.status_code >= 400:
                raise RuntimeError(f"HTTP {self.status_code}")

    def _auth_ok(self, headers):
        return (headers or {}).get("Authorization") == "Bearer at-1"

    def post(self, url, data=None, params=None, content=None,
             headers=None):
        if url.endswith("/token"):
            self.token_calls += 1
            assert data["grant_type"] == "refresh_token"
            assert data["refresh_token"] == "rt-xyz"
            return self._R(200, {"access_token": "at-1",
                                 "expires_in": 3600})
        if "/upload/" in url:
            if not self._auth_ok(headers):
                return self._R(401)
            # parse the multipart/related body: [meta json][payload]
            boundary = headers["Content-Type"].split("boundary=")[1]
            parts = content.split(b"--" + boundary.encode())
            meta = json.loads(parts[1].split(b"\r\n\r\n", 1)[1]
                              .rsplit(b"\r\n", 1)[0])
            payload = parts[2].split(b"\r\n\r\n", 1)[1] \
                .rsplit(b"\r\n", 1)[0]
            fid = f"id{self._next}"
            self._next += 1
            assert meta["parents"] == ["folder9"]
            self.files[fid] = (meta["name"], payload)
            return self._R(200, {"id": fid})
        return self._R(404)

    def get(self, url, params=None, headers=None):
        if not self._auth_ok(headers):
            return self._R(401)
        if url.endswith("/files"):
            q = params["q"]
            out = []
            for fid, (name, _) in self.files.items():
                if f"name = '{name}'" in q or "name =" not in q:
                    out.append({"id": fid, "name": name})
            return self._R(200, {"files": out})
        fid = url.rsplit("/", 1)[-1]
        if params and params.get("alt") == "media" \
                and fid in self.files:
            return self._R(200, content=self.files[fid][1])
        return self._R(404)

    def delete(self, url, headers=None):
        if not self._auth_ok(headers):
            return self._R(401)
        self.files.pop(url.rsplit("/", 1)[-1], None)
        return self._R(204)


import json  # noqa: E402


def test_gdrive_target_round_trip():
    from birdnet_go_tpu.utils.backup import GDriveTarget

    sess = FakeDriveSession()
    t = GDriveTarget("cid", "csec", "rt-xyz", folder_id="folder9",
                     session=sess)
    t.store("a.tar.gz", b"alpha")
    t.store("b.tar.gz.enc", b"beta")
    assert t.list() == ["a.tar.gz", "b.tar.gz.enc"]
    assert t.fetch("b.tar.gz.enc") == b"beta"
    t.delete("a.tar.gz")
    assert t.list() == ["b.tar.gz.enc"]
    # token fetched once and reused within its validity window
    assert sess.token_calls == 1
    with pytest.raises(FileNotFoundError):
        t.fetch("missing.tar.gz")


def test_gdrive_via_build_target_and_manager(tmp_path):
    from birdnet_go_tpu.config.settings import BackupSettings
    from birdnet_go_tpu.utils.backup import BackupManager, build_target

    sess = FakeDriveSession()
    s = BackupSettings(target="gdrive",
                       remote={"client_id": "cid", "client_secret": "c",
                               "refresh_token": "rt-xyz",
                               "folder_id": "folder9"})
    t = build_target(s)
    t.session = sess
    mgr = _mgr_with_db(tmp_path)
    mgr.target = t
    name = mgr.run_once()
    assert name in t.list()
    report = mgr.verify(name)
    assert report["database"]["integrity"] == "ok"

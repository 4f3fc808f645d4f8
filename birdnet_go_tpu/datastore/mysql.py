"""MySQL datastore: the full SQLite datastore surface over the wire client.

Reference: internal/datastore/mysql.go (GORM MySQL driver). Design: the
SQLite datastore's ~40 query methods are dialect-portable except for a
handful of constructs, so MySQLDatastore subclasses Datastore and swaps
`self._conn` for a shim that (a) translates those constructs
(AUTOINCREMENT, ON CONFLICT upserts, CAST AS INTEGER, PRAGMA),
(b) executes over the wire-level MySQLConnection, and (c) returns
sqlite3.Row-compatible rows — one implementation of the 62-method-role
interface, two engines.
"""

from __future__ import annotations

import logging
import re
import threading
from typing import Any

from birdnet_go_tpu.datastore.mysql_wire import MySQLConnection
from birdnet_go_tpu.datastore.sqlite import _SCHEMA, Datastore

log = logging.getLogger("birdnet_tpu.mysql")

_EXCLUDED = re.compile(r"excluded\.(\w+)")
_ON_CONFLICT = re.compile(
    r"ON CONFLICT\s*\(([^)]+)\)\s*DO UPDATE SET", re.IGNORECASE)


# columns that participate in keys/indexes in the schema — MySQL refuses
# TEXT in a key specification without a length, so these become VARCHAR
_KEY_COLUMNS = ("model_id", "scientific_name", "date", "source_id")
_KEY_COL_RE = re.compile(
    r"\b(" + "|".join(_KEY_COLUMNS) + r")\s+TEXT\b")


def translate_sql(sql: str) -> str:
    """SQLite dialect → MySQL dialect for the statements this codebase uses."""
    out = sql.replace("AUTOINCREMENT", "AUTO_INCREMENT")
    out = out.replace("AS INTEGER)", "AS SIGNED)")
    # sqlite upsert dialects → MySQL upserts
    out = _ON_CONFLICT.sub("ON DUPLICATE KEY UPDATE", out)
    out = _EXCLUDED.sub(r"VALUES(\1)", out)
    out = re.sub(r"^\s*INSERT OR REPLACE INTO", "REPLACE INTO", out,
                 flags=re.IGNORECASE)
    # TEXT cannot be a key in MySQL without a prefix length: give every
    # key-participating column (PKs, composite PKs, indexed columns) a
    # bounded VARCHAR instead
    out = out.replace("TEXT PRIMARY KEY", "VARCHAR(191) PRIMARY KEY")
    if "CREATE TABLE" in out.upper():
        out = _KEY_COL_RE.sub(r"\1 VARCHAR(191)", out)
        # MySQL refuses DEFAULT on TEXT columns (error 1101); every insert
        # in this codebase supplies these columns explicitly, so the
        # default is only a sqlite nicety — drop it for MySQL
        out = re.sub(r"TEXT NOT NULL DEFAULT '[^']*'", "TEXT NOT NULL", out)
    return out


class _Row:
    """sqlite3.Row stand-in: r["col"], dict(r), iteration, indexing."""

    __slots__ = ("_cols", "_vals")

    def __init__(self, cols: list[str], vals: tuple):
        self._cols = cols
        self._vals = vals

    def __getitem__(self, key):
        if isinstance(key, int):
            return self._vals[key]
        return self._vals[self._cols.index(key)]

    def keys(self):
        return list(self._cols)

    def __iter__(self):
        return iter(self._vals)

    def __len__(self):
        return len(self._vals)


class _Cursor:
    def __init__(self, cols, rows, affected, lastrowid):
        self._rows = [_Row(cols, r) for r in rows]
        self.rowcount = affected
        self.lastrowid = lastrowid
        self._idx = 0

    def fetchone(self):
        if self._idx >= len(self._rows):
            return None
        r = self._rows[self._idx]
        self._idx += 1
        return r

    def fetchall(self):
        rows, self._rows = self._rows[self._idx:], []
        return rows

    def __iter__(self):
        rows = self._rows[self._idx:]
        self._idx = len(self._rows)
        return iter(rows)


_NUMERIC = re.compile(r"^-?\d+$")
_FLOATY = re.compile(r"^-?\d*\.\d+(e-?\d+)?$", re.IGNORECASE)


def _coerce(v):
    """Text-protocol values arrive as strings; coerce obvious numerics so
    consumers see the same types the sqlite driver returns."""
    if v is None or not isinstance(v, str):
        return v
    if _NUMERIC.match(v):
        try:
            return int(v)
        except ValueError:
            return v
    if _FLOATY.match(v):
        return float(v)
    return v


class _ConnShim:
    """Duck-types the sqlite3.Connection surface the Datastore methods use."""

    def __init__(self, conn: MySQLConnection):
        self._conn = conn

    def execute(self, sql: str, args: tuple | list = ()) -> _Cursor:
        sql = translate_sql(sql)
        up = sql.lstrip().upper()
        if up.startswith("PRAGMA"):
            return _Cursor([], [], 0, 0)
        if up.startswith(("SELECT", "SHOW", "DESCRIBE")):
            cols, rows = self._conn.query(sql, tuple(args))
            rows = [tuple(_coerce(v) for v in r) for r in rows]
            return _Cursor(cols, rows, 0, 0)
        affected, last = self._conn.execute(sql, tuple(args))
        return _Cursor([], [], affected, last)

    def executescript(self, script: str) -> None:
        for stmt in script.split(";"):
            stmt = stmt.strip()
            if not stmt:
                continue
            # MySQL has no CREATE INDEX IF NOT EXISTS: probe + swallow
            # the duplicate-key error instead.
            if stmt.upper().startswith("CREATE INDEX IF NOT EXISTS"):
                stmt = stmt.replace("IF NOT EXISTS ", "", 1)
                try:
                    self.execute(stmt)
                except Exception as e:          # 1061 = duplicate key name
                    if getattr(e, "code", None) != 1061:
                        log.debug("index create skipped: %s", e)
                continue
            self.execute(stmt)

    def commit(self) -> None:                  # autocommit on the wire
        pass

    def close(self) -> None:
        self._conn.close()


class MySQLDatastore(Datastore):
    """Datastore on MySQL: same behavior surface as the SQLite engine."""

    def __init__(self, host: str = "127.0.0.1", port: int = 3306,
                 user: str = "birdnet", password: str = "",
                 database: str = "birdnet",
                 connection: MySQLConnection | None = None):
        # NOTE: deliberately does NOT call Datastore.__init__ (which opens
        # sqlite); replicates its setup with the shim connection.
        self.path = f"mysql://{user}@{host}:{port}/{database}"
        conn = connection or MySQLConnection(
            host=host, port=port, user=user, password=password,
            database=database)
        self._conn = _ConnShim(conn)
        self._lock = threading.Lock()
        with self._lock:
            self._conn.executescript(_SCHEMA)
            self._automigrate()

    def _automigrate(self) -> None:
        try:
            cols = {r[0] for r in self._conn.execute(
                "SHOW COLUMNS FROM dynamic_thresholds")}
            if "last_learned_at" not in cols:
                self._conn.execute(
                    "ALTER TABLE dynamic_thresholds"
                    " ADD COLUMN last_learned_at REAL NOT NULL DEFAULT 0")
        except Exception:
            log.debug("automigrate probe failed", exc_info=True)

    def integrity_check(self) -> dict[str, Any]:
        """Database doctor (mysql inspector role): table status summary."""
        with self._lock:
            rows = [dict(zip(r.keys(), r)) for r in self._conn.execute(
                "SHOW TABLE STATUS")]
        return {"tables": len(rows), "engine_ok": True}

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
                      if p.suffix == ".gz")

    def delete(self, name: str) -> None:
        (self.dir / name).unlink(missing_ok=True)


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
        self.target.store(name, buf.getvalue())
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

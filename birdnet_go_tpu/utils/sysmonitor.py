"""Host resource monitoring (reference: internal/monitor via gopsutil).

Pure-stdlib sampling of CPU load, memory, and disk for the
/api/v2/system/resources endpoint and health checks.
"""

from __future__ import annotations

import os
import shutil
import time


def cpu_load() -> dict:
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:
        la1 = la5 = la15 = 0.0
    return {"load_1m": round(la1, 2), "load_5m": round(la5, 2),
            "load_15m": round(la15, 2), "cores": os.cpu_count()}


def memory_info() -> dict:
    info = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                key, _, rest = line.partition(":")
                if key in ("MemTotal", "MemAvailable", "MemFree"):
                    info[key] = int(rest.strip().split()[0]) * 1024
    except OSError:
        return {}
    total = info.get("MemTotal", 0)
    avail = info.get("MemAvailable", info.get("MemFree", 0))
    return {
        "total_bytes": total,
        "available_bytes": avail,
        "used_percent": round(100.0 * (total - avail) / total, 1)
        if total else 0.0,
    }


def disk_info(path: str = ".") -> dict:
    try:
        u = shutil.disk_usage(path)
    except OSError:
        return {}
    return {
        "total_bytes": u.total,
        "free_bytes": u.free,
        "used_percent": round(100.0 * (u.total - u.free) / u.total, 1),
    }


def resources(clip_dir: str = ".") -> dict:
    return {
        "time": time.time(),
        "cpu": cpu_load(),
        "memory": memory_info(),
        "disk": disk_info(clip_dir),
    }

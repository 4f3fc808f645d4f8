"""Bounded accelerator-backend probe with graceful CPU degradation.

The JAX accelerator plugin initializes lazily on the first backend touch
and, when its transport is unreachable (TPU tunnel down, PCIe device
wedged), blocks the caller for its own retry budget — measured ~25 min
in this environment — before raising. A long-lived `serve` daemon must
not hang unbounded on boot for an accelerator that may be temporarily
absent; the reference degrades the same way when an optional runtime
(OpenVINO/XNNPACK) is missing: log, fall back, keep serving
(/root/reference/internal/inference model fallback chain).

probe_backend() runs `jax.devices()` in a SUBPROCESS bounded by a
timeout. Success costs one extra interpreter startup (~seconds) and
proves the plugin healthy; timeout/failure kills the child and pins the
parent to the CPU backend BEFORE its own (unbounded, uninterruptible)
backend init would run — the parent process never touches the broken
plugin. Degradation emits a tagged EnhancedError into the /system/errors
ring so operators see WHY the node is serving on CPU.
"""

from __future__ import annotations

import logging
import os
import subprocess
import sys

log = logging.getLogger("birdnet_tpu.backendprobe")

# True once THIS process degraded to CPU because of a probe failure —
# lets callers (bench.py) distinguish "healthy CPU-only host" from
# "accelerator present but unreachable" without re-probing.
DEGRADED = False

_PROBE_CODE = (
    "import jax\n"
    "print('PLATFORM=' + jax.devices()[0].platform)\n"
)


def probe_backend(timeout_s: float = 120.0) -> str:
    """Probe accelerator-backend health in a bounded subprocess and
    return the platform the CURRENT process should use.

    - healthy accelerator (or plain CPU host): returns the probed
      platform name; the parent's backend init proceeds normally.
    - probe timeout or backend error: forces the parent to the CPU
      backend via ``jax.config.update("jax_platforms", "cpu")`` (the
      accelerator plugin overrides the JAX_PLATFORMS env var, so the
      config update is the only reliable switch — CLAUDE.md) and
      returns ``"cpu"``.

    Must be called BEFORE anything initializes a JAX backend in this
    process.
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ),
        )
    except subprocess.TimeoutExpired:
        _degrade(f"backend probe exceeded {timeout_s:.0f}s "
                 f"(accelerator transport unreachable?)")
        return "cpu"
    if r.returncode == 0:
        for line in r.stdout.splitlines():
            if line.startswith("PLATFORM="):
                platform = line.split("=", 1)[1].strip()
                log.info("backend probe ok: %s", platform)
                return platform
    tail = (r.stderr or r.stdout or "").strip().splitlines()
    _degrade("backend init failed in probe: "
             + (tail[-1] if tail else f"exit {r.returncode}"))
    return "cpu"


def _degrade(reason: str) -> None:
    global DEGRADED

    import jax

    DEGRADED = True
    jax.config.update("jax_platforms", "cpu")
    log.warning("accelerator backend unavailable — degrading to the CPU "
                "backend (%s); inference capacity is reduced, service "
                "stays up", reason)
    from birdnet_go_tpu.utils import errors as errors_mod

    errors_mod.new(f"accelerator unavailable, serving on CPU: {reason}") \
        .component("inference") \
        .category(errors_mod.Category.MODEL) \
        .context("fallback", "cpu").build()

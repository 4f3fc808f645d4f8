"""ctypes bindings to the native host data plane (native/birdnet_host.cpp).

Builds on demand with g++ when the shared library is missing; every
consumer degrades gracefully to the pure-Python implementations when the
toolchain or library is unavailable (`available()` gates usage).
"""

from birdnet_go_tpu.native.lib import (
    available,
    alsa_available,
    alsa_list_devices,
    build_native,
    NativeAnalysisBuffer,
    AlsaCapture,
    set_malloc_arena_max,
)

__all__ = [
    "available",
    "alsa_available",
    "alsa_list_devices",
    "build_native",
    "NativeAnalysisBuffer",
    "AlsaCapture",
    "set_malloc_arena_max",
]
